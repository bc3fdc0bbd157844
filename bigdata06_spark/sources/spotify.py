"""Spotify-shaped ingest connector — the reference's entire `[REF]`
source surface (SURVEY.md §2.A.1 S1-S10) re-expressed as a Spark-first
pipeline.

The reference is four imperative scripts doing sequential
`requests.get` calls into pandas (`make_api_request` —
Spotify_API3.py:48-83; genre fan-out — Spotify_API3.py:88-104;
pagination — Spotify_API4.py:327-356; 50-id batching —
Spotify_API3.py:160-209). This module keeps the connector concerns
(auth, retry, rate limit, pagination) at the driver edge behind a
pluggable `fetcher` callable — tests and offline runs inject a fixture
fetcher; a live run would inject a requests-based one — and hands
Spark typed DataFrames immediately:

- payload flattening is Catalyst expressions (functions/flatten.py),
  not row loops;
- the per-artist / per-album fetch loops (S4/S6) become an ID
  DataFrame → `mapInPandas` batch fetch at scale (each partition
  fetches its ID batch — the chunking the reference hand-rolled with
  `[i:i+50]` slices becomes partition sizing);
- dedup/union/sort/top-k on the results are the engine operators
  (operators/relational.py).

`fetcher(endpoint, params) -> dict` is the engine boundary; the network
lives behind the `transport` seam of `SpotifyFetcher`, with
`http_transport` as the live requests/urllib implementation (tested
against an in-process stub HTTP server) and fixture transports for
offline runs. That keeps the connector testable and the engine pure.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata06_spark.functions.flatten import array_head_or

Fetcher = Callable[[str, dict], dict]

GENRES = ["pop", "rock", "hip hop", "k-pop", "edm"]  # Spotify_API3.py:88

ARTIST_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("popularity", T.IntegerType()),
        T.StructField("followers", T.StructType([T.StructField("total", T.LongType())])),
        T.StructField("genres", T.ArrayType(T.StringType())),
        T.StructField("images", T.ArrayType(T.StructType([T.StructField("url", T.StringType())]))),
    ]
)

TRACK_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("popularity", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("explicit", T.BooleanType()),
        T.StructField(
            "album",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("release_date", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "artists",
            T.ArrayType(
                T.StructType(
                    [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
                )
            ),
        ),
    ]
)


PLAYLIST_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField(
            "owner",
            T.StructType(
                [T.StructField("id", T.StringType()), T.StructField("display_name", T.StringType())]
            ),
        ),
        T.StructField("followers", T.StructType([T.StructField("total", T.LongType())])),
        T.StructField("tracks", T.StructType([T.StructField("total", T.LongType())])),
        T.StructField("images", T.ArrayType(T.StructType([T.StructField("url", T.StringType())]))),
        T.StructField("external_urls", T.StructType([T.StructField("spotify", T.StringType())])),
        T.StructField("public", T.BooleanType()),
        T.StructField("collaborative", T.BooleanType()),
    ]
)

CATEGORY_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("icons", T.ArrayType(T.StructType([T.StructField("url", T.StringType())]))),
    ]
)


def playlist_flatten_columns() -> list:
    """The playlist payload → row-shape projection of the reference
    (Spotify_API4.py:259-271), as reusable Column expressions over a
    relation with `PLAYLIST_PAYLOAD_SCHEMA` fields: nested owner fields
    lifted, `followers.total` defaulted to 0 when the followers struct
    is absent, first-image URL with '' default, safe external-url get,
    nullable `public` passed through, `collaborative` defaulted False."""
    return [
        F.col("id"),
        F.col("name"),
        F.col("description"),
        F.col("owner.id").alias("owner_id"),
        F.col("owner.display_name").alias("owner_name"),
        F.coalesce(F.col("followers.total"), F.lit(0)).alias("followers"),
        F.col("tracks.total").alias("tracks_total"),
        array_head_or(F.col("images")["url"]).alias("image_url"),
        F.coalesce(F.col("external_urls.spotify"), F.lit("")).alias("spotify_url"),
        F.col("public"),
        F.coalesce(F.col("collaborative"), F.lit(False)).alias("collaborative"),
    ]


def category_flatten_columns() -> list:
    """Category payload → row shape (Spotify_API3.py:299-303): id, name,
    first-icon URL with '' default."""
    return [
        F.col("id"),
        F.col("name"),
        array_head_or(F.col("icons")["url"]).alias("icon_url"),
    ]


def flatten_playlists(spark: SparkSession, payloads: list[dict]) -> DataFrame:
    """P1/P3/P6 flatten of playlist payloads into the reference's
    playlist shape (Spotify_API4.py:259-271)."""
    raw = spark.createDataFrame(payloads, schema=PLAYLIST_PAYLOAD_SCHEMA)
    return raw.select(*playlist_flatten_columns())


def flatten_categories(spark: SparkSession, payloads: list[dict]) -> DataFrame:
    """Category flatten (Spotify_API3.py:290-303): the categories page
    payload's items → (id, name, icon_url)."""
    raw = spark.createDataFrame(payloads, schema=CATEGORY_PAYLOAD_SCHEMA)
    return raw.select(*category_flatten_columns())


def search_artists(spark: SparkSession, fetcher: Fetcher, genres: list[str] = None,
                   limit_per_genre: int = 50) -> DataFrame:
    """S6 genre fan-out + S1 GET + payload flatten (P1-P5).

    The fetch loop is driver-side (it seeds the pipeline — reference
    semantics, ≤5 calls); everything after `createDataFrame` is
    Catalyst. Flattening reproduces the reference row shape
    (Spotify_API3.py:113-120): followers.total lifted, genres kept as a
    native array, first-image URL with '' default."""
    rows = []
    for genre in genres or GENRES:
        payload = fetcher("search", {"q": f'genre:"{genre}"', "type": "artist",
                                     "limit": limit_per_genre})
        rows.extend(payload.get("artists", {}).get("items", []))
    raw = spark.createDataFrame(rows, schema=ARTIST_PAYLOAD_SCHEMA)
    return raw.select(
        "id",
        "name",
        F.coalesce("popularity", F.lit(0)).alias("popularity"),
        F.coalesce(F.col("followers.total"), F.lit(0)).alias("followers"),
        F.coalesce("genres", F.array().cast("array<string>")).alias("genres"),
        array_head_or(F.col("images")["url"]).alias("image_url"),
    )


def _batch_fetch_tracks(fetcher: Fetcher, batch_size: int = 50):
    """S4 — batched multi-get as a mapInPandas stage: each Arrow batch
    of IDs becomes ceil(n/batch_size) API calls (the reference's
    `[i:i+50]` chunk loop — Spotify_API3.py:176), executed per
    partition, i.e. in parallel across executors instead of one
    sequential driver loop."""
    import pandas as pd

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            items = []
            for i in range(0, len(ids), batch_size):
                payload = fetcher("tracks", {"ids": ",".join(ids[i : i + batch_size])})
                items.extend(payload.get("tracks", []))
            yield pd.DataFrame(
                {
                    "id": [t.get("id") for t in items],
                    "name": [t.get("name") for t in items],
                    "popularity": [t.get("popularity", 0) for t in items],
                    "duration_ms": [t.get("duration_ms", 0) for t in items],
                }
            )

    return fn


def fetch_tracks_for_ids(id_df: DataFrame, fetcher: Fetcher, batch_size: int = 50) -> DataFrame:
    """Distributed S4: ID DataFrame → per-partition batched fetch.
    `fetcher` is shipped to executors — it must be picklable by value
    (a closure/local def) or importable on workers."""
    from bigdata06_spark.session import ensure_workers_can_import

    ensure_workers_can_import(id_df.sparkSession)
    schema = "id string, name string, popularity int, duration_ms long"
    return id_df.select("id").mapInPandas(_batch_fetch_tracks(fetcher, batch_size), schema=schema)


def paginate(fetcher: Fetcher, endpoint: str, params: dict, page_size: int = 50,
             max_pages: int = 100) -> list[dict]:
    """S5 — offset/limit pagination until a short page
    (Spotify_API4.py:327-356). Driver-edge connector loop."""
    items: list[dict] = []
    for page in range(max_pages):
        payload = fetcher(endpoint, {**params, "limit": page_size, "offset": page * page_size})
        batch = payload.get("items", [])
        items.extend(batch)
        if len(batch) < page_size:
            break
    return items


def flatten_tracks(spark: SparkSession, payloads: list[dict]) -> DataFrame:
    """P1-P4 flatten of track payloads into the reference's v3 track
    shape (Spotify_API3.py:141-151), arrays kept native."""
    raw = spark.createDataFrame(payloads, schema=TRACK_PAYLOAD_SCHEMA)
    return raw.select(
        "id",
        "name",
        F.coalesce("popularity", F.lit(0)).alias("popularity"),
        F.col("album.name").alias("album_name"),
        F.col("album.release_date").alias("release_date"),
        F.coalesce("duration_ms", F.lit(0)).alias("duration_ms"),
        F.coalesce("explicit", F.lit(False)).alias("explicit"),
        array_head_or(F.col("artists")["id"]).alias("artist_id"),
        array_head_or(F.col("artists")["name"]).alias("artist_name"),
    )


class SpotifyFetcher:
    """S1-S3 + S7: the reference's `make_api_request` micro-lifecycle
    (SURVEY.md §3 E3) as an injectable-transport Fetcher.

    - S2 token fetch: OAuth2 client-credentials with a base64 Basic
      header (Spotify_API.py:16-40).
    - S3 retry: on HTTP 401 refresh the token and retry once
      (Spotify_API.py:54-57, Spotify_API3.py:70-73).
    - S7 throttle: ≥`min_interval` seconds between calls
      (Spotify_API3.py:63) — a min-interval gate, not per-call sleeps,
      so back-to-back calls pay only the remaining wait.
    - market default injection for endpoints that accept it
      (Spotify_API3.py:57-60).
    - errors → None, matching the reference's sentinel contract
      (Spotify_API3.py:74-83); callers guard with `is_empty` (R9).

    `transport(url, params, headers) -> (status, payload)` is the
    network boundary — tests inject a fake; a live run injects a
    requests-based one. `sleep`/`clock` are injectable for testing the
    throttle without wall-clock waits.
    """

    TOKEN_URL = "https://accounts.spotify.com/api/token"
    API_BASE = "https://api.spotify.com/v1"
    MARKET_ENDPOINTS = {"search", "new-releases", "top-tracks"}

    def __init__(self, client_id: str, client_secret: str, transport,
                 min_interval: float = 0.5, market: str = "US",
                 sleep=None, clock=None,
                 token_url: str | None = None, api_base: str | None = None):
        import time

        self._auth = (client_id, client_secret)
        self._transport = transport
        self._min_interval = min_interval
        self._market = market
        self._sleep = sleep or time.sleep
        self._clock = clock or time.monotonic
        self._token: str | None = None
        self._last_call: float | None = None
        # instance overrides so a live fetcher can point at a stub
        # server (tests) or a proxy without subclassing
        if token_url is not None:
            self.TOKEN_URL = token_url
        if api_base is not None:
            self.API_BASE = api_base

    def _basic_auth_header(self) -> dict:
        import base64

        raw = f"{self._auth[0]}:{self._auth[1]}".encode()
        return {"Authorization": "Basic " + base64.b64encode(raw).decode()}

    def _refresh_token(self) -> None:
        status, payload = self._transport(
            self.TOKEN_URL, {"grant_type": "client_credentials"}, self._basic_auth_header()
        )
        self._token = payload.get("access_token") if status == 200 else None

    def _throttle(self) -> None:
        now = self._clock()
        if self._last_call is not None:
            wait = self._min_interval - (now - self._last_call)
            if wait > 0:
                self._sleep(wait)
        self._last_call = self._clock()

    def __call__(self, endpoint: str, params: dict) -> dict | None:
        if self._token is None:
            self._refresh_token()
        if endpoint in self.MARKET_ENDPOINTS and "market" not in params:
            params = {**params, "market": self._market}
        self._throttle()
        status, payload = self._transport(
            f"{self.API_BASE}/{endpoint}", params, {"Authorization": f"Bearer {self._token}"}
        )
        if status == 401:  # S3: stale token → refresh once, retry
            self._refresh_token()
            status, payload = self._transport(
                f"{self.API_BASE}/{endpoint}", params, {"Authorization": f"Bearer {self._token}"}
            )
        return payload if status == 200 else None


def http_transport(timeout: float = 10.0, session=None):
    """Live HTTP transport for `SpotifyFetcher`: `(url, params, headers)
    -> (status, payload_dict)` — completes S1-S3 as runnable code (the
    reference's `requests.get`/`post` calls, Spotify_API3.py:48-83,
    Spotify_API.py:16-40) while keeping the transport seam injectable.

    Wire semantics: the OAuth2 token endpoint takes a form-encoded POST
    (client-credentials grant); every API endpoint is a query-string
    GET. Non-JSON bodies decode to {}; transport-level failures return
    (0, {}) so the fetcher's status checks handle them like any non-200
    (reference behavior: ConnectionError → None sentinel,
    Spotify_API3.py:74-83).

    Uses `requests` (connection-pooled Session) when importable, else
    stdlib urllib — no hard dependency, so offline environments can
    still import this module and tests can exercise both paths."""
    try:
        import requests
    except ImportError:
        requests = None

    if requests is not None:
        sess = session or requests.Session()

        def transport(url: str, params: dict, headers: dict):
            try:
                if url.rstrip("/").endswith("/token"):
                    resp = sess.post(url, data=params or {}, headers=headers, timeout=timeout)
                else:
                    resp = sess.get(url, params=params or {}, headers=headers, timeout=timeout)
            except requests.RequestException:
                return 0, {}
            try:
                return resp.status_code, resp.json()
            except ValueError:
                return resp.status_code, {}

        return transport

    import json
    import urllib.error
    import urllib.parse
    import urllib.request

    def transport(url: str, params: dict, headers: dict):
        data = urllib.parse.urlencode(params or {})
        if url.rstrip("/").endswith("/token"):
            req = urllib.request.Request(url, data=data.encode(), headers=headers, method="POST")
        else:
            req = urllib.request.Request(url + ("?" + data if data else ""), headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                status, body = resp.status, resp.read()
        except urllib.error.HTTPError as e:
            status, body = e.code, e.read()
        except (urllib.error.URLError, OSError):
            return 0, {}
        try:
            return status, json.loads(body.decode() or "{}")
        except ValueError:
            return status, {}

    return transport


def first_nonempty(*thunks) -> DataFrame | None:
    """S10 — fallback source: evaluate alternatives in order, return the
    first non-empty DataFrame (featured playlists when the primary
    extract is empty — Spotify_API2.py:93-116; new-release albums —
    Spotify_API2.py:342-372). Driver-edge control flow: each thunk is
    only invoked (and its fetches only happen) if the previous ones
    came back empty."""
    last = None
    for thunk in thunks:
        df = thunk()
        last = df
        if df is not None and not df.isEmpty():
            return df
    return last
