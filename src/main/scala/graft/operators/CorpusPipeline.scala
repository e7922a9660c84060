package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** The composed LLM corpus-preparation DAG as ONE declared query:
  * MinHash near-dup pairs → connected components → survivor filter →
  * overlapping token chunking → greedy sequence packing. Every stage
  * exists as its own oracle-checked operator (q_dedup_minhash,
  * q_dedup_cc, q_dedup_survivors, q_text_chunk, q_text_pack); this
  * entry proves they COMPOSE — the pair relation and shingle frame come
  * from the session-scoped [[graft.FrameCache]], so a pipeline run
  * computes the expensive band join once, not once per stage consumer.
  *
  * The reference has no corpus tooling at all (SURVEY.md §5 — numeric
  * sensor CSVs); this is the extension surface's end-to-end shape: what
  * a user actually runs nightly over a crawl before tokenizer/LM
  * training.
  *
  * Scale shape: dedup is the banded equi-join (never all-pairs), CC
  * carries O(log d) keyed shuffles with checkpointed lineage, the
  * survivor filter is a left-anti join, chunking is stateless per-row
  * generator work, and packing is the two-pass distributed cumsum (the
  * only global window runs over one row per partition). No stage holds
  * corpus-sized state on any single node.
  */
object CorpusPipeline {

  private val ChunkLen = 40
  private val ChunkStride = 30
  private val BinBudget = 2048
  private val PackParts = 8

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_pipeline_corpus",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val cc = Clustering.connectedComponents(
          Dedup.minhashPairs(s, d).select("a", "b"))
        val removed = cc.filter(col("v") =!= col("lab"))
          .select(col("v").as("doc_id"))
        val kept = Tables.documents(s, d).select("doc_id", "text")
          .join(removed, Seq("doc_id"), "left_anti")
        // q_text_chunk's window shape (40 tokens, stride 30, last start
        // keeps ≥ 10 tokens), counting tokens only — the pack stage
        // needs sizes, not bodies.
        val chunks = kept
          .selectExpr("doc_id", "split(text, ' ') AS toks")
          .selectExpr("doc_id",
            s"posexplode(transform(sequence(1, greatest(size(toks) - 9, 1), $ChunkStride), " +
              s"i -> size(slice(toks, i, $ChunkLen)))) AS (chunk_idx, chunk_toks)")
        // q_text_pack's two-pass distributed cumsum, keyed by the
        // composite (doc_id, chunk_idx) order; localCheckpoint pins one
        // pid↔row layout for both branches (see distributedCumsumPack).
        val parted = chunks
          .repartitionByRange(PackParts, col("doc_id"), col("chunk_idx"))
          .withColumn("pid", spark_partition_id())
          .localCheckpoint(true)
        val wLocal = Window.partitionBy("pid").orderBy("doc_id", "chunk_idx")
          .rowsBetween(Window.unboundedPreceding, 0)
        val local = parted.withColumn("cum", sum(col("chunk_toks")).over(wLocal))
        val wPrefix = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
        val offsets = parted.groupBy("pid")
          .agg(sum(col("chunk_toks")).as("part_toks"))
          .withColumn("offset", coalesce(sum(col("part_toks")).over(wPrefix), lit(0L)))
          .select("pid", "offset")
        local.join(broadcast(offsets), "pid")
          .selectExpr(s"CAST(floor((cum + offset - 1) / $BinBudget) AS BIGINT) AS bin",
            "chunk_toks")
          .groupBy("bin")
          .agg(count(lit(1)).as("n_chunks"),
            sum(col("chunk_toks")).cast("bigint").as("bin_toks"))
          .orderBy("bin")
      },
      // The oracle replays the full chain declaratively: recursive-CTE
      // components over the verified-pair relation, NOT-IN survivors,
      // the unnest chunker, and a single global-window cumsum (fine at
      // oracle scale; the Spark side's two-pass cumsum is the
      // distributed strategy arriving at the identical packing).
      Some(s"""WITH RECURSIVE ${Clustering.duckCcCtes},
              |removed AS (SELECT v FROM cc WHERE v <> cluster),
              |kept AS (SELECT doc_id, text FROM documents
              |         WHERE doc_id NOT IN (SELECT v FROM removed)),
              |chunks AS (
              |  SELECT doc_id, UNNEST(list_transform(generate_series(1, len(starts)), j ->
              |    struct_pack(chunk_idx := j - 1,
              |      chunk_toks := CAST(len(toks[starts[j]:starts[j] + ${ChunkLen - 1}]) AS INT))),
              |    recursive := true)
              |  FROM (SELECT doc_id, toks,
              |          generate_series(1, greatest(len(toks) - 9, 1), $ChunkStride) AS starts
              |        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM kept))),
              |binned AS (
              |  SELECT CAST(floor((SUM(chunk_toks) OVER (ORDER BY doc_id, chunk_idx
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1) / $BinBudget) AS BIGINT) AS bin,
              |    chunk_toks
              |  FROM chunks)
              |SELECT bin, COUNT(*) AS n_chunks, CAST(SUM(chunk_toks) AS BIGINT) AS bin_toks
              |FROM binned GROUP BY bin ORDER BY bin""".stripMargin))
  )
}
