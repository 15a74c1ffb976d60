"""S7: HTTP/REST source (reference: APIClient,
ETL-Airflow/dags/tasks/utils.py:14-84 — GET with optional JWT bearer
token and a date parameter, feeding ``spark.createDataFrame``).

Driver-side by design: the reference's REST feed is a control-plane
source (hundreds-to-thousands of rows per day).  Large feeds must land
as files and go through a distributed scan instead — this client
refuses oversized payloads rather than silently materializing them on
the driver.

stdlib urllib only (no extra dependencies); auth is a bearer token
header exactly like the reference's JWT flow.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .scans import read_json_rows

MAX_BYTES = 64 * 1024 * 1024  # driver-side safety valve


class RestSourceError(RuntimeError):
    pass


def fetch_json(
    url: str,
    params: dict[str, str] | None = None,
    bearer_token: str | None = None,
    timeout: float = 30.0,
    max_bytes: int = MAX_BYTES,
) -> Any:
    """GET ``url`` (+query params) and parse the JSON body.  Raises
    RestSourceError on HTTP errors or payloads above ``max_bytes``."""
    if params:
        sep = "&" if urllib.parse.urlparse(url).query else "?"
        url = url + sep + urllib.parse.urlencode(params)
    req = urllib.request.Request(url)
    if bearer_token:
        req.add_header("Authorization", f"Bearer {bearer_token}")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read(max_bytes + 1)
    except (urllib.error.URLError, OSError) as e:
        raise RestSourceError(f"GET {url} failed: {e}") from e
    if len(body) > max_bytes:
        raise RestSourceError(
            f"payload exceeds {max_bytes} bytes — land large feeds as files, not REST"
        )
    try:
        return json.loads(body)
    except json.JSONDecodeError as e:
        raise RestSourceError(f"non-JSON response from {url}: {e}") from e


def read_rest(
    spark: SparkSession,
    url: str,
    date: str | None = None,
    bearer_token: str | None = None,
    column_names: list[str] | None = None,
    records_path: str | None = None,
) -> DataFrame:
    """REST feed → DataFrame: fetch, optionally descend into
    ``records_path`` (the reference's payloads nest rows under a key),
    positional-rename, and hand off to ``spark.createDataFrame``."""
    payload = fetch_json(url, params={"date": date} if date else None, bearer_token=bearer_token)
    if records_path is not None:
        payload = payload[records_path]
    if not isinstance(payload, list):
        raise RestSourceError(f"expected a JSON array of records, got {type(payload).__name__}")
    if not payload:
        raise RestSourceError("empty feed — refusing to infer a schema from zero rows")
    return read_json_rows(spark, payload, column_names)
