"""Spark 4 Python Data Source for the Spotify-shaped connector:
`spark.read.format("spotify")` — the DataSource-V2-native expression of
the reference's genre fan-out extraction (Spotify_API3.py:88-104).

Where `sources/spotify.py` drives the fan-out from the DRIVER (seed
list → fetch loop → createDataFrame), this source moves it into the
engine's planner/executor contract:

- each genre is an `InputPartition` → the fan-out parallelizes across
  EXECUTORS, one task per genre, with no driver-side fetch loop;
- `pushFilters` handles genre predicates at PLAN time: a
  `WHERE genre = 'pop'` prunes the partition list to one REST call —
  custom-source partition pruning, the same contract a parquet scan
  gets from Catalyst (plan- and unit-tested);
- the transport comes from string OPTIONS (serializable to executors):
  `transport=fixture` (deterministic offline payloads — the default,
  and what the DuckDB oracle replays) or `transport=http` (the live
  `SpotifyFetcher` + `http_transport` lifecycle: token POST, 401
  refresh-retry, throttle — exercised against an in-process stub HTTP
  server from REAL executor processes in tests).

Scale: one task per genre is the reference's granularity; a production
source would split hot genres by search-offset ranges into multiple
partitions (same InputPartition mechanics, offset windows as the
partition payload).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)

DEFAULT_GENRES = ["pop", "rock", "hip hop", "k-pop", "edm"]  # Spotify_API3.py:88

SCHEMA = (
    "genre string, id string, name string, popularity int, followers long, image_url string"
)

FIXTURE_ARTISTS_PER_GENRE = 5


def fixture_payload(genre: str) -> dict:
    """Deterministic offline search payload for one genre — the shape
    `search_artists` flattens. Pure function of the genre string, so a
    SQL oracle can replay it exactly (see `source_spotify_datasource`
    in queries/refparity.py): artist i of genre g has
    id 'g-i', popularity (i·17 + len(g)) % 101, followers
    i·1000 + len(g); artist 3 has no image (the '' default path)."""
    items = []
    for i in range(FIXTURE_ARTISTS_PER_GENRE):
        items.append(
            {
                "id": f"{genre}-{i}",
                "name": f"{genre} artist {i}",
                "popularity": (i * 17 + len(genre)) % 101,
                "followers": {"total": i * 1000 + len(genre)},
                "images": [] if i == 3 else [{"url": f"http://img/{genre}/{i}"}],
            }
        )
    return {"artists": {"items": items}}


def _build_fetcher(options):
    """Construct the per-executor fetcher from string options. Runs on
    the EXECUTOR (options are the only channel into a Python data
    source partition read), so everything must rebuild from strings."""
    transport = (options.get("transport") or "fixture").lower()
    if transport == "fixture":
        return lambda endpoint, params: fixture_payload(params["_genre"])
    if transport == "http":
        from bigdata06_spark.sources.spotify import SpotifyFetcher, http_transport

        return SpotifyFetcher(
            options.get("client_id", ""),
            options.get("client_secret", ""),
            http_transport(timeout=float(options.get("timeout", "10"))),
            min_interval=float(options.get("min_interval", "0")),
            market=options.get("market", "US"),
            token_url=options.get("token_url"),
            api_base=options.get("api_base"),
        )
    raise ValueError(f"unknown transport {transport!r} (fixture|http)")


class GenrePartition(InputPartition):
    def __init__(self, genre: str):
        self.genre = genre


class SpotifyArtistsReader(DataSourceReader):
    def __init__(self, options):
        self.options = options
        genres_opt = options.get("genres")
        self.genres = genres_opt.split(",") if genres_opt else list(DEFAULT_GENRES)

    def pushFilters(self, filters):  # noqa: N802 — Spark API name
        """Partition pruning: genre equality/IN predicates shrink the
        REST fan-out at plan time; every other filter is returned as
        unsupported so Spark keeps evaluating it post-scan."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("genre",):
                self.genres = [g for g in self.genres if g == f.value]
            elif isinstance(f, In) and f.attribute == ("genre",):
                wanted = set(f.value)
                self.genres = [g for g in self.genres if g in wanted]
            else:
                yield f

    def partitions(self):
        return [GenrePartition(g) for g in self.genres]

    def read(self, partition: GenrePartition):
        genre = partition.genre
        fetcher = _build_fetcher(self.options)
        limit = int(self.options.get("limit", "50"))
        payload = fetcher(
            "search",
            {"q": f'genre:"{genre}"', "type": "artist", "limit": limit, "_genre": genre},
        ) or {}
        for a in payload.get("artists", {}).get("items", []):
            images = a.get("images") or []
            yield (
                genre,
                a.get("id"),
                a.get("name"),
                int(a.get("popularity") or 0),
                int((a.get("followers") or {}).get("total") or 0),
                images[0].get("url", "") if images else "",
            )


class SpotifyDataSource(DataSource):
    """`spark.read.format("spotify")` — register with
    `spark.dataSource.register(SpotifyDataSource)`."""

    @classmethod
    def name(cls) -> str:
        return "spotify"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return SpotifyArtistsReader(self.options)


def register(spark) -> None:
    """Idempotently register the source and make it importable on
    executor processes (partition reads unpickle this module there).
    Python-source filter pushdown ships disabled by default; it's a
    runtime-settable conf, so enable it here — a reader that implements
    pushFilters errors outright under a session that leaves it off
    (e.g. the external driver's vanilla builder)."""
    from bigdata06_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SpotifyDataSource)


# ------------------------------------------------- streaming (incremental sync)

STREAM_SCHEMA = "offset long, id string, name string, popularity int"
FIXTURE_TOTAL_ITEMS = 120  # mirrors the stub server's /v1/albums collection


def fixture_page(offset: int, limit: int, total: int = FIXTURE_TOTAL_ITEMS) -> list[dict]:
    """Deterministic page of an ordered collection — the pure function
    both the stream reader and its batch-equivalence test replay."""
    return [
        {"id": f"alb{i}", "name": f"album {i}", "popularity": (i * 13) % 101}
        for i in range(offset, min(offset + limit, total))
    ]


class SpotifyPageStreamReader(SimpleDataSourceStreamReader):
    """S5 pagination as STREAMING OFFSETS: each micro-batch reads the
    next page(s) of an ordered collection; the page cursor is the
    checkpointed offset. This is the incremental-API-sync shape — a
    restarted query resumes from the committed cursor instead of
    re-listing, and a replayed batch (`readBetweenOffsets`) re-fetches
    exactly its offset window, which makes the sink-side effects
    idempotent-able (streaming/sinks.py). The reference's pagination
    loop (Spotify_API4.py:327-356) forgets its position on every run;
    this one is the always-on version."""

    def __init__(self, options):
        self.options = options
        self.page_size = int(options.get("page_size", "50"))
        self.total = int(options.get("total", str(FIXTURE_TOTAL_ITEMS)))

    def initialOffset(self) -> dict:
        return {"pos": int(self.options.get("start_offset", "0"))}

    def _rows(self, start: int, end: int) -> list[tuple]:
        # a LIST, not a generator: Spark's prefetch cache copies the
        # returned iterator when planning partitions (generators can't
        # be copied/pickled)
        return [
            (int(item["id"][3:]), item["id"], item["name"], item["popularity"])
            for item in fixture_page(start, end - start, self.total)
        ]

    def read(self, start: dict):
        pos = start["pos"]
        end = min(pos + self.page_size, self.total)
        return iter(self._rows(pos, end)), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["pos"], end["pos"]))


class SpotifyStreamDataSource(DataSource):
    """`spark.readStream.format("spotify_pages")` — paginated REST
    collection as an unbounded stream with checkpointed page cursors."""

    @classmethod
    def name(cls) -> str:
        return "spotify_pages"

    def schema(self) -> str:
        return STREAM_SCHEMA

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return SpotifyPageStreamReader(self.options)


def register_stream(spark) -> None:
    from bigdata06_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    spark.dataSource.register(SpotifyStreamDataSource)
