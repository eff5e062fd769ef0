"""MongoDB deserialization modes + schema conformance (reference T4,
java/deserializers/MongoDBDebeziumToJSONDeserializer.java:30-258).

Three modes (``mongodb.deserialization.mode``):
- ``top-level-type``: payload parsed against the inferred typed schema
- ``top-level-string``: every field a string
- ``doc-string``: two columns — ``_id`` + the whole document as JSON

Schema-drift contract (:209-255), applied per micro-batch:
- missing fields → null-filled (from_json does this natively) + warning
- EXTRA fields → hard failure instructing the user to version the table
  via table.name.map (evolution is manual, README.md:136-147)

Extra-field detection is set algebra on ``json_object_keys`` — an
aggregation over distinct key-sets, not a per-record Python check.

Extended-JSON ``$``-wrappers ($numberLong/$date/$oid/$numberDecimal/
$numberDouble/$timestamp) are unwrapped per field at projection time
(:123-135).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cdc_multi_spark.functions.sanitizer import sanitize


class SchemaDriftError(RuntimeError):
    """Extra field(s) beyond the pinned schema
    (MongoDBDebeziumToJSONDeserializer.java:232-254)."""


_DOLLAR_WRAPPERS = (
    "$numberLong",
    "$numberDecimal",
    "$numberDouble",
    "$date",
    "$oid",
)


def unwrap_field(payload: Column, field: str) -> Column:
    """coalesce over the extended-JSON wrappers, then the raw value;
    $timestamp unwraps to its seconds component."""
    base = f"$.{field}"
    candidates = [F.get_json_object(payload, f"{base}.{w}") for w in _DOLLAR_WRAPPERS]
    candidates.append(F.get_json_object(payload, f"{base}.$timestamp.t"))
    candidates.append(F.get_json_object(payload, base))
    return F.coalesce(*candidates)


def check_extra_fields(
    df: DataFrame, payload_col: str, schema: T.StructType
) -> list[str]:
    """Distinct payload keys not covered by the pinned schema. Cheap: one
    explode over json_object_keys + distinct (key-universe is tiny)."""
    allowed = {f.name for f in schema.fields} | {"_id"}
    observed = (
        df.select(F.explode(F.json_object_keys(F.col(payload_col))).alias("k"))
        .distinct()
        .collect()
    )
    return sorted({sanitize(r["k"]) for r in observed} - allowed)


def project_mongo_payload(
    df: DataFrame,
    payload_col: str,
    schema: T.StructType,
    mode: str = "top-level-type",
    fail_on_extra: bool = True,
) -> DataFrame:
    """Typed projection of the payload per deserialization mode, with the
    drift contract applied. Keeps all non-payload columns."""
    if fail_on_extra and mode != "doc-string":
        extra = check_extra_fields(df, payload_col, schema)
        if extra:
            raise SchemaDriftError(
                f"extra fields {extra} not in pinned schema; version the "
                f"collection via table.name.map (e.g. mytable_v20240401)"
            )

    others = [c for c in df.columns if c != payload_col]
    if mode == "doc-string":
        return df.select(*others, strip_id_expr(F.col(payload_col)).alias("doc"))

    if mode == "top-level-string":
        fields = [
            unwrap_field(F.col(payload_col), f.name).alias(sanitize(f.name))
            for f in schema.fields
        ]
        return df.select(*others, *fields)

    # top-level-type: unwrap $-wrappers then cast to the inferred type.
    # The ANSI cast is DELIBERATE: a value that no longer fits the pinned
    # type is schema drift just like an extra field, and the drift
    # contract is null-fill for MISSING, hard-fail for CHANGED — the
    # batch aborts uncommitted (at-least-once replay) and the operator
    # re-versions the collection, exactly like the extra-field path.
    # try_cast here would silently null real data instead.
    # (test_type_mismatch_hard_fails pins this.)
    fields = [
        unwrap_field(F.col(payload_col), f.name)
        .cast(f.dataType)
        .alias(sanitize(f.name))
        for f in schema.fields
    ]
    return df.select(*others, *fields)


def strip_id_expr(payload: Column) -> Column:
    """doc-string repack: whole document minus the TOP-LEVEL ``_id`` as a
    JSON string (:195-201). Pure JVM-side: parse to map<string,variant>
    (variant preserves nested structure and scalar types bit-for-bit),
    map_filter out the key, re-serialize — no Python in the hot path.
    Nested ``_id`` keys are untouched, matching the reference's
    documentJson.remove("_id"). Unparseable payloads fall back to the raw
    string (same contract the old vectorized-Python kernel had)."""
    stripped = F.to_json(
        F.map_filter(
            F.from_json(payload, "map<string,variant>"),
            lambda k, _: k != F.lit("_id"),
        )
    )
    return F.when(payload.isNull(), F.lit(None)).otherwise(
        F.coalesce(stripped, payload)
    )


def normalize_mongo_id(payload: Column) -> Column:
    """``_id`` normalization (:76-93, README.md:225-228): $oid extracted,
    any other literal stringified."""
    return F.coalesce(
        F.get_json_object(payload, "$._id.$oid"), F.get_json_object(payload, "$._id")
    )


# ---------------------------------------------------------------------------
# Server-version compatibility gate + live-sampling shape
# (MongoDBStreamer.java:145-187 startup resolution, :214-231 buildInfo
# version check; live clients are gated exactly like sources/jdbc.py — no
# database ships in this container)
# ---------------------------------------------------------------------------

COMPAT_VERSION_FLOOR = "4.0.0"
_TS_OFFSET_RE = __import__("re").compile(r"^[1-9][0-9]*$")

# MongoDB system databases cannot be streamed (change streams are not
# supported on them); the reference refuses them up front
# (MongoDBStreamer.java:74-79, case-insensitive).
_SYSTEM_DBS = __import__("re").compile(r"^(?:admin|config|local)$", __import__("re").IGNORECASE)


def ensure_not_system_db(database: str) -> str:
    """Refuse admin/config/local (MongoDBStreamer.java:74-79). Returns the
    name unchanged so callers can use it inline."""
    if _SYSTEM_DBS.match(database or ""):
        raise ValueError(f"CANNOT STREAM FROM SYSTEM DB: {database}")
    return database


def compare_versions(a: str, b: str) -> int:
    """Numeric dotted-segment compare ('3.6.4' < '4.0.0' < '4.10.1');
    missing segments count as 0, non-numeric suffixes are ignored."""

    def parts(v: str) -> list[int]:
        out = []
        for seg in v.split("."):
            digits = "".join(ch for ch in seg if ch.isdigit())
            out.append(int(digits) if digits else 0)
        return out

    pa, pb = parts(a), parts(b)
    n = max(len(pa), len(pb))
    pa += [0] * (n - len(pa))
    pb += [0] * (n - len(pb))
    return (pa > pb) - (pa < pb)


def resolve_mongo_startup(
    startup_mode: str,
    offset_value: str | None,
    server_version: str | None,
) -> tuple[str, str | None, list[str]]:
    """(effective_mode, effective_offset, warnings) per the reference's
    startup matrix: unknown modes → initial; offset mode with no value →
    initial; a server < 4.0 enters compatibility mode (snapshot or
    CDC-from-latest only, timestamp offsets SILENTLY ignored, no timestamp
    splitting ⇒ concurrency 1); otherwise the offset must be epoch millis.

    ``offset_value`` must be the MERGED effective offset — config
    offset.value if set, else the stored offset-file value (the reference
    folds the store into offset.value in configureOffset BEFORE the
    streamer's startup resolution, FlinkCDCMulti.java:190-193) — so a
    resumed job's stored offset gets the same compat-mode ignore and
    format validation as a user-provided one.
    """
    warnings: list[str] = []
    mode = startup_mode if startup_mode in ("initial", "earliest", "latest", "offset") else "initial"
    compat = (
        server_version is not None
        and compare_versions(server_version, COMPAT_VERSION_FLOOR) < 0
    )
    if compat:
        warnings.append(
            f"mongodb {server_version} < {COMPAT_VERSION_FLOOR}: compatibility "
            "mode — snapshot or CDC from latest only; timestamp offsets "
            "ignored; concurrency limited to 1 (no timestamp splitting)"
        )
    offset = offset_value
    if compat and offset:
        # whatever the mode, a timestamp offset cannot drive resume on a
        # pre-4.0 server (no timestamp splitting)
        warnings.append("compatibility mode; timestamp offset ignored")
        offset = None
        if mode == "offset":
            mode = "latest"
    elif mode == "offset" and not offset:
        warnings.append("no offset provided; startup mode offset -> initial")
        mode = "initial"
    elif offset and not _TS_OFFSET_RE.match(offset):
        raise ValueError(
            f"mongodb offset not in timestamp-milliseconds format: {offset!r}"
        )
    return mode, offset, warnings


def live_server_version(uri: str) -> str:
    """buildInfo version over a live client (gated: pymongo is not in this
    container; the version string can also be supplied via the
    ``mongodb.server.version`` config key for feed-based runs)."""
    try:
        import pymongo  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - no client library here
        raise RuntimeError(
            "pymongo not available; pass mongodb.server.version in config"
        ) from e
    return pymongo.MongoClient(uri).admin.command("buildInfo")["version"]


def live_sample_docs(uri: str, database: str, collection: str, limit: int = 100) -> list[dict]:
    """collection.find().limit(100) sampling for schema inference
    (MongoDBStreamer.java:283-295) — gated like live_server_version; tests
    feed documents straight to catalog.infer_mongo_schema."""
    try:
        import pymongo  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - no client library here
        raise RuntimeError(
            "pymongo not available; pass sample docs to infer_mongo_schema"
        ) from e
    return list(pymongo.MongoClient(uri)[database][collection].find().limit(limit))
