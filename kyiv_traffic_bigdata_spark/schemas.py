"""Explicit StructTypes for every dataset the engine reads or writes.

Schema-on-read is always explicit (no inference) so that scans prune
columns and malformed records degrade to nulls deterministically
(PERMISSIVE mode). Shapes mirror the reference's data model (SURVEY.md §1):

* positions / routes: nested JSONL envelopes from the KPT poller
  (reference ``kpt/poller/writer.py:86-91``, ``kpt/poller/models.py:42-59``)
* GeoJSON FeatureCollection (reference ``open-street-map/pipeline/importer.py:192-212``)
* OSM elements (reference ``importer.py:258-291``)
* Open-Meteo struct-of-arrays weather (reference ``weather/pipeline/extract.py:14-21``)
* EWAY decoded GPS rows (reference ``eway/pipeline/ws_interceptor.py:37-62``)
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# KPT vehicle positions
# ---------------------------------------------------------------------------

#: One vehicle fix (reference kpt/poller/models.py:8-39).
POSITION = T.StructType(
    [
        T.StructField("vehicle_id", T.LongType()),
        T.StructField("route_id", T.LongType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("direction", T.IntegerType()),
        T.StructField("flag", T.IntegerType()),
        # Device/event time, epoch seconds. Often stale by years (SURVEY §2.8
        # ST4) — never used for watermarks, only for per-vehicle deltas.
        T.StructField("timestamp", T.LongType()),
    ]
)

#: One JSONL line = one 5-second flush envelope (reference kpt/poller/writer.py:86-91).
POSITIONS_ENVELOPE = T.StructType(
    [
        T.StructField("collected_by", T.StringType()),
        T.StructField("timestamp", T.StringType()),  # ISO-8601 ingest time
        T.StructField("count", T.LongType()),
        T.StructField("positions", T.ArrayType(POSITION)),
    ]
)

# ---------------------------------------------------------------------------
# KPT route catalog (dimension)
# ---------------------------------------------------------------------------

#: One catalog route (shape observed in reference data/kpt_routes_20260207.jsonl:1).
ROUTE = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("type", T.IntegerType()),
        T.StructField("number", T.StringType()),
    ]
)

#: One JSONL line = one 30-second poll snapshot (reference kpt/poller/models.py:42-59).
ROUTES_ENVELOPE = T.StructType(
    [
        T.StructField("collected_by", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("poll_number", T.LongType()),
        T.StructField("route_count", T.LongType()),
        T.StructField("routes", T.ArrayType(ROUTE)),
    ]
)

# ---------------------------------------------------------------------------
# GeoJSON (reference importer.py:192-212; [lon, lat] coordinate order)
# ---------------------------------------------------------------------------

GEOJSON_GEOMETRY = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("coordinates", T.ArrayType(T.DoubleType())),
    ]
)

GEOJSON_FEATURE = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("geometry", GEOJSON_GEOMETRY),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
    ]
)

GEOJSON_FEATURE_COLLECTION = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("features", T.ArrayType(GEOJSON_FEATURE)),
    ]
)

# ---------------------------------------------------------------------------
# OSM elements (reference importer.py:82-89, 258-291) — sparse union of
# node / way / relation shapes; tags are a string map.
# ---------------------------------------------------------------------------

OSM_MEMBER = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("ref", T.LongType()),
        T.StructField("role", T.StringType()),
    ]
)

OSM_ELEMENT = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("nodes", T.ArrayType(T.LongType())),
        T.StructField("members", T.ArrayType(OSM_MEMBER)),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)

OSM_RESPONSE = T.StructType(
    [
        T.StructField("version", T.DoubleType()),
        T.StructField("generator", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("elements", T.ArrayType(OSM_ELEMENT)),
    ]
)

# ---------------------------------------------------------------------------
# Open-Meteo weather history — the one columnar (struct-of-arrays) input
# (reference weather/pipeline/extract.py:14-58). Pivoted to hourly rows by
# sources.weather.pivot_hourly.
# ---------------------------------------------------------------------------

WEATHER_HOURLY_FIELDS = (
    "temperature_2m",
    "relative_humidity_2m",
    "precipitation",
    "rain",
    "snowfall",
    "weather_code",
    "wind_speed_10m",
    "wind_direction_10m",
)

WEATHER_HOURLY_STRUCT = T.StructType(
    [T.StructField("time", T.ArrayType(T.StringType()))]
    + [T.StructField(f, T.ArrayType(T.DoubleType())) for f in WEATHER_HOURLY_FIELDS]
)

WEATHER_RESPONSE = T.StructType(
    [
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("elevation", T.DoubleType()),
        T.StructField("timezone", T.StringType()),
        T.StructField("hourly_units", T.MapType(T.StringType(), T.StringType())),
        T.StructField("hourly", WEATHER_HOURLY_STRUCT),
    ]
)

# ---------------------------------------------------------------------------
# EWAY decoded GPS coordinate (reference ws_interceptor.py:37-62)
# ---------------------------------------------------------------------------

GPS_COORDINATE = T.StructType(
    [
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("offset", T.IntegerType()),
    ]
)
