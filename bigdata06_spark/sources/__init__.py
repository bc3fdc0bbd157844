"""Source connectors: schema-checked file readers + the offline
Spotify-shaped ingest connector (reference parity, SURVEY.md §2.A.1)."""
