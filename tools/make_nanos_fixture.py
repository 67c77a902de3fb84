#!/usr/bin/env python3
"""One-off generator for the TIMESTAMP(NANOS) test fixture.

Spark cannot WRITE nanosecond-annotated parquet (it caps at micros), so the
legacy nanosAsLong read path over a genuinely NANOS-annotated footer could
only be pinned by a fixture produced outside Spark. This writes three
events-shaped rows whose ts column is int64 TIMESTAMP(NANOS,
isAdjustedToUTC=false) — the encoding early testdata generations shipped —
into src/test/resources/nanos_events/events.parquet. Run once; the fixture
is committed. Regenerate only if the schema contract changes.
"""
import pyarrow as pa
import pyarrow.parquet as pq

US = [1700000000000000, 1700000123456789, 1700003600000001]
t = pa.table({
    "event_id": pa.array([1, 2, 3], pa.int64()),
    "ts": pa.array([u * 1000 for u in US], pa.timestamp("ns")),
    "user_id": pa.array([10, 11, 10], pa.int64()),
    "event_type": pa.array(["click", "purchase", "view"], pa.string()),
    "value": pa.array([1.5, 2.5, 0.5], pa.float64()),
    "props": pa.array(["{}", "{}", "{}"], pa.string()),
})
out = "src/test/resources/nanos_events/events.parquet"
pq.write_table(t, out, version="2.6", compression="snappy")
print(pq.read_metadata(out).schema)
