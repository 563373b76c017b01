"""nexusbase_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of INLOpen/nexusbase (a Go LSM time-series DB).

Reference semantics are re-expressed Spark-first: the storage machinery
(WAL/SSTable/compaction — reference ``wal/``, ``sstable/``, ``levels/``) is
deliberately NOT rebuilt; Parquet + Catalyst provide the equivalents
(SURVEY.md §4). What IS rebuilt is the computational surface:

- data model: tagged multi-field time-series points (reference
  ``core/datapoint.go:7-12``)
- scans/filters: metric + conjunctive tag equality + inclusive time range
  (reference ``engine2/adapter.go:1103-1397``)
- MVCC last-write-wins + point/series/range tombstones (reference
  ``iterator/iterator.go:244-294``, ``engine2/adapter.go:2773-2791``)
- final aggregation + windowed downsampling with the reference's numeric
  fidelity rules (reference ``iterator/multi_field_aggregator.go``,
  ``iterator/multi_field_downsampling_iterator.go``)
- ordering / limit / keyset cursor pagination (reference
  ``iterator/iterator.go:34-75``, ``iterator/skipping_iterator.go``)
- metadata queries (SHOW METRICS / TAG KEYS / TAG VALUES)
- NBQL front end (parser + DataFrame planner)
- streaming subscribe surface (Structured Streaming)
- large-scale training-data pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing) — beyond the reference's surface.
"""

__version__ = "0.1.0"
