package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: the multi-dimensional skipping property itself —
  * z-range "files" bound BOTH dimensions at once, which single-column
  * sorting provably cannot — plus the write-path shape (one range
  * shuffle, files internally sorted by z-value).
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("z-buckets bound both dimensions; single-dim sort leaves the other dimension unbounded") {
    def num(r: org.apache.spark.sql.Row, i: Int): Double =
      r.getAs[Number](i).doubleValue
    val rows = SparkEntry.queries("q_zorder")(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
      .agg(max("l_partkey"), max("l_suppkey")).collect()(0)
    val (pRange, sRange) = (num(li, 0), num(li, 1))

    // mean normalized envelope area under z-order: each z-range sees a
    // small rectangle of the (part, supp) plane
    val zAreas = rows.map { r =>
      ((num(r, 3) - num(r, 2)) / pRange) * ((num(r, 5) - num(r, 4)) / sRange)
    }
    val zMean = zAreas.sum / zAreas.length
    assert(zMean < 0.25, s"z-order envelopes too loose: $zMean")

    // the comparison layout: same file count, sorted by l_partkey only —
    // the suppkey envelope of every file spans ~the full domain
    val oneD = Tables.lineitem(spark, sf)
      .withColumn("b", ntile(rows.length).over(
        org.apache.spark.sql.expressions.Window.orderBy("l_partkey", "l_orderkey", "l_linenumber")))
      .groupBy("b")
      .agg(min("l_suppkey").as("lo"), max("l_suppkey").as("hi"))
      .collect()
    val oneDSuppSpan = oneD.map(r => (num(r, 2) - num(r, 1)) / sRange)
    val oneDMean = oneDSuppSpan.sum / oneDSuppSpan.length
    assert(oneDMean > 0.7,
      s"single-dim sort unexpectedly bounded the second dimension: $oneDMean")
    // and z-order's per-bucket supp spans are strictly tighter on average
    val zSuppSpans = rows.map(r => (num(r, 5) - num(r, 4)) / sRange)
    val zSuppMean = zSuppSpans.sum / zSuppSpans.length
    assert(zSuppMean < oneDMean,
      s"z-order supp spans not tighter: z=$zSuppMean vs 1d=$oneDMean")
  }

  test("z-clustered write is one range shuffle producing internally-sorted files") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val z = operators.Layout.mortonSql(
      "CAST(l_partkey % 256 AS BIGINT)", "CAST(l_suppkey % 256 AS BIGINT)")
    val zed = Tables.lineitem(spark, sf).selectExpr("*", s"$z AS zval")
    zed.repartitionByRange(4, col("zval"))
      .sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".parquet"))
    assert(files.length === 4)
    // each file's z-values are a contiguous, internally sorted range
    val perFile = files.map { f =>
      val v = spark.read.parquet(f.getPath).select("zval")
        .collect().map(_.getLong(0))
      assert(v.sameElements(v.sorted), s"${f.getName} not sorted")
      (v.min, v.max)
    }.sortBy(_._1)
    perFile.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, "file z-ranges overlap")
      case _ =>
    }
  }

  test("hilbert encode is a bijection whose consecutive positions are grid-adjacent") {
    // the DEFINING curve property — this is what makes q_hilbert a
    // Hilbert curve rather than any bijective bit-mix (the DuckDB
    // oracle shares the expression text, so only a property pin can
    // catch a shared algorithmic bug): all 65536 cells map to distinct
    // d, and |Δx| + |Δy| = 1 between every consecutive pair of d.
    // gx/gy carry the ORIGINAL coordinates through the chain (the
    // x/y state columns are rotated in place by the encode)
    val grid = spark.range(65536L).selectExpr(
      "CAST(id / 256 AS BIGINT) AS gx", "CAST(id % 256 AS BIGINT) AS gy",
      "CAST(id / 256 AS BIGINT) AS x", "CAST(id % 256 AS BIGINT) AS y")
    val byD = operators.Layout.hilbertD(grid, Seq("gx", "gy"))
      .collect().map(r => (r.getAs[Long]("d"), r.getAs[Long]("gx"), r.getAs[Long]("gy")))
      .sortBy(_._1)
    assert(byD.length === 65536)
    assert(byD.head._1 === 0L && byD.last._1 === 65535L)
    assert(byD.map(_._1).distinct.length === 65536, "d is not a bijection")
    byD.sliding(2).foreach {
      case Array((d1, x1, y1), (_, x2, y2)) =>
        val manhattan = math.abs(x2 - x1) + math.abs(y2 - y1)
        assert(manhattan === 1L, s"curve jumps at d=$d1: ($x1,$y1)->($x2,$y2)")
      case _ =>
    }
  }

  test("native hilbert_d equals the chained-projection formulation on the full grid") {
    // the DuckDB oracle runs the chain; the hot path runs the native
    // codegen loop — they must agree on every one of the 65536 cells
    val grid = spark.range(65536L).selectExpr(
      "CAST(id / 256 AS BIGINT) AS gx", "CAST(id % 256 AS BIGINT) AS gy",
      "CAST(id / 256 AS BIGINT) AS x", "CAST(id % 256 AS BIGINT) AS y")
    val native = operators.Layout.hilbertD(grid, Seq("gx", "gy"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val chained = operators.Layout.hilbertDChained(grid, Seq("gx", "gy"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(native === chained)
  }

  test("hilbert range envelopes are no looser than morton's on the same keys") {
    def num(r: org.apache.spark.sql.Row, i: Int): Double =
      r.getAs[Number](i).doubleValue
    def meanArea(q: String): Double = {
      val rows = SparkEntry.queries(q)(spark, sf).collect()
      val areas = rows.map(r => (num(r, 3) - num(r, 2) + 1) * (num(r, 5) - num(r, 4) + 1))
      areas.sum / areas.length
    }
    val (h, z) = (meanArea("q_hilbert"), meanArea("q_zorder"))
    // locality claim, quantified: strict adjacency buys envelopes at
    // least as tight as the quadrant-jumping morton curve (small slack:
    // 32 coarse ranges blur the asymptotic advantage at sf0.001)
    assert(h <= z * 1.1, s"hilbert mean envelope area $h vs morton $z")
  }

  test("compaction rewrites a fragmented table into size-targeted files, content intact") {
    import java.nio.file.Files
    val frag = Files.createTempDirectory("graft_frag").toString
    val compacted = Files.createTempDirectory("graft_compacted").toString
    // simulate a per-trigger streaming sink: 64 tiny files
    val src = Tables.lineitem(spark, sf)
    src.repartition(64).write.mode("overwrite").parquet(frag)
    def parquetFiles(dir: String): Array[java.io.File] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(frag).length === 64)
    val totalBytes = parquetFiles(frag).map(_.length()).sum
    val n = operators.Layout.compact(spark, frag, compacted, targetBytes = totalBytes / 4)
    val out = parquetFiles(compacted)
    assert(out.length === n, s"returned $n but ${out.length} on disk")
    assert(n >= 3 && n <= 6, s"expected ~total/target (~4-5) files, got $n")
    // lossless: same rows, same content
    val a = spark.read.parquet(frag)
    val b = spark.read.parquet(compacted)
    assert(a.count() === b.count())
    assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L)
  }

  test("dynamic partition overwrite rewrites only the targeted partition") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_write_dynamic")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val before = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = before.keys.max
    val evens = Tables.documents(spark, sf)
      .filter(col("lang") === target && col("doc_id") % 2 === 0).count()
    assert(out(target) === evens, "targeted partition must hold only the rewrite")
    (before.keySet - target).foreach { l =>
      assert(out(l) === before(l), s"sibling partition $l was touched")
    }
    // the overwrite mode is restored after the query (session hygiene;
    // getOption surfaces the built-in STATIC default, not None)
    val mode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    assert(!mode.exists(_.equalsIgnoreCase("dynamic")), s"mode leaked: $mode")
  }
}
