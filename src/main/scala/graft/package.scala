/** =Graft: a Spark-native analytics engine=
  *
  * Spark-first re-expression of the capabilities of Mellanox/UDA (an
  * RDMA shuffle+merge substrate for Hadoop MapReduce; see SURVEY.md) plus
  * the LLM-training-data operators a 100 TB pipeline needs. Everything is
  * declarative DataFrame/Catalyst — shuffle, sort, merge, spill and flow
  * control are delegated to Spark's engine, which is the library's whole
  * design thesis (reference behavior, idiomatic Spark execution).
  *
  * ==Where things live==
  *
  *  - [[graft.SparkEntry]] — the registry: every operator exposed as a
  *    named query `(SparkSession, sfDir) => DataFrame`, each paired with
  *    a DuckDB oracle in `oracleSql` (the correctness contract).
  *  - `graft.queries.*` — relational surface (joins/aggs/windows/sets/
  *    scalars), storage layouts, event streams, LLM-data ops.
  *  - [[graft.dedup.Dedup]] — exact / MinHash-LSH / SimHash / n-gram
  *    Jaccard / SRP-banded embedding dedup;
  *    [[graft.dedup.Clusters]] — pairs → connected components → keep list.
  *  - [[graft.similarity.Ann]] — brute-force / SRP-LSH / IVF top-k.
  *  - [[graft.text.TextFunctions]] — tokenization, language ID, quality,
  *    fingerprints (native expressions, zero shuffle).
  *  - [[graft.operators]] — as-of join, sessionization, salted skew
  *    join, upsert/merge, deterministic sampling, global prefix
  *    scan / row numbering.
  *  - [[graft.plans.GroupTopK]] — group-wise top-k as a full custom
  *    operator (logical node → strategy → partial+final exec).
  *  - [[graft.expressions]] — native Catalyst expressions backing the
  *    hot paths (shingles, SimHash, SRP signatures, dot/cosine with
  *    codegen, Morton interleave, centroid probing).
  *  - [[graft.sources.Layout]] — partitioned / bucketed / z-ordered
  *    writes, small-file compaction.
  *  - `graft.streaming.EventsStreaming` — Structured Streaming faces:
  *    watermarked windows, sessions, keyed state, streaming dedup,
  *    checkpointed sinks, stream-stream and stream-static joins.
  *  - [[graft.shuffle.KV]] — the reference's KV shuffle-merge semantics
  *    (sorted runs, key routing) as a thin veneer over Spark exchanges;
  *    `org.apache.spark.shuffle.graft.GraftShuffleManager` — the
  *    pluggable shuffle seam (the reference's RDMA plug point).
  *
  * ==Session setup==
  *
  * All SQL-registered functions install via
  * [[graft.GraftSessionExtensions]] (`spark.sql.extensions`) or
  * `graft.functions.GraftFunctions.register(spark)`.
  *
  * ==Design rules (enforced across the codebase)==
  *
  *  1. No driver-side data loops: `collect()` only on bounded aggregates.
  *  2. Money/summable doubles go through DECIMAL(18,2) so results are
  *     partitioning-independent (and oracle-replayable).
  *  3. Small sides broadcast; skew is handled (salting, AQE skew join,
  *     signature-collapse in the LSH bucket joins).
  *  4. Hot per-row computation is a native expression, not stacked
  *     higher-order functions (measured >100× on the dedup pipelines).
  *  5. Every operator has either a DuckDB oracle (hash compare) or a
  *     machine-readable accuracy artifact (recall / error vs exact).
  *  6. Output invariance gates: identical results under different
  *     shuffle-partition counts AND with AQE on/off (DeterminismSpec) —
  *     layout knobs must never be semantic inputs.
  *  7. Bounded memory in custom operators: GroupTopK spills to an
  *     external sort past a row budget; bench measures the heavy family
  *     at two scale points ([[graft.ScaleFixture]]) and reports the
  *     scaling exponent.
  */
package object graft
