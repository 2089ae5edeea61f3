"""logfowd2_spark — a from-scratch, PySpark-native rebuild of the
semantics of soulgarden/logfowd2 (a Rust/tokio Kubernetes log forwarder)
as a batch/micro-batch parse → enrich → route → aggregate pipeline over
columnar tables of pre-tokenized log sequences.

This is NOT a port: the reference's execution machinery (tokio tasks,
bounded channels, circuit breakers — see SURVEY.md §2.7) is replaced
wholesale by Spark's DataFrame/Catalyst/AQE engine.  What is preserved is
the reference's *data semantics*: the Event row shape
(reference src/domain/event.rs:4-17), the K8s path-metadata extraction
(src/watcher.rs:31,595-638), line truncation/sanitization kernels
(src/domain/file.rs:553-721), per-sink routing (ES daily-index routing at
src/infrastructure/elasticsearch/pool.rs:856-865, generalized to
route-by-(source, level)), dead-letter quarantine
(src/infrastructure/elasticsearch/dead_letter_queue.rs), checkpointed
resumability (src/domain/state.rs), and metrics promoted to data
(src/infrastructure/metrics/collector.rs).
"""

__version__ = "0.1.0"
