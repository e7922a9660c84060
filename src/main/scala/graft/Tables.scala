package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are single parquet files; at 100 TB these would be
  * partitioned directories (e.g. lineitem partitioned by shipdate month)
  * and the same `spark.read.parquet(dir)` call works unchanged — Catalyst
  * gets partition pruning + predicate pushdown for free on the directory
  * layout, so nothing here hard-codes single-file assumptions.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries an INT64 TIMESTAMP(NANOS) column the reader
    // otherwise refuses; harmless for the micro/milli tables.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** events.parquet's `ts` column has shipped in two physical formats:
    *
    *   - INT64 TIMESTAMP(NANOS) (older driver drops + `tools/ScaleGen`
    *     sf1/sf3/sf10 files): Spark's vectorized reader rejects the type,
    *     so `nanosAsLong` surfaces it as a raw long and we integer-divide
    *     to micros — the generator emits whole-micro values, so `DIV 1000`
    *     is lossless. Integer division on the long, not `/1000.0`:
    *     1.7e18 ns does not round-trip through a double.
    *   - plain INT64 TIMESTAMP micros, no tz (current driver drops): Spark
    *     infers TIMESTAMP_NTZ; cast to session-local TIMESTAMP so every
    *     downstream `window()`/`dayofweek()`/interval expression sees one
    *     type. The session tz is pinned to UTC ([[GraftSession]]), so the
    *     cast is a value-preserving relabel matching DuckDB's naive reads.
    *
    * Branch on the loaded type rather than the file vintage so both data
    * generations (and a future straight-TIMESTAMP drop) read identically.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Oracle-parity helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * same SQL. Double-typed aggregates are NOT order-deterministic across
  * engines (different partial-sum orders), so every checked aggregate goes
  * through exact decimal arithmetic:
  *
  *   - per-row `double -> DECIMAL(p,s)` rounding is deterministic and
  *     engine-agnostic *except* at exact halfway points, which a double
  *     CAN hit when it has the form odd/2^(s+1) (then Spark rounds
  *     HALF_UP, DuckDB half-even). The business columns summed here are
  *     generator-rounded decimals whose stored doubles never take that
  *     form, so the cast agrees bit-for-bit; derived *products* (e.g.
  *     embedding dots) must NOT use this path — see
  *     [[graft.operators.Similarity.sparkDot]] for the floor-quantized
  *     alternative with no halfway case;
  *   - decimal addition is exact, hence order-independent;
  *   - the final `DECIMAL -> double` cast is correctly rounded in both
  *     engines.
  *
  * Per-row double arithmetic (+,-,*,/) is IEEE-754-deterministic and needs
  * no such treatment.
  *
  * Cost of determinism, measured (TPC-H Q1 shape, sf0.1, local[32],
  * best of 3): DECIMAL(28) sums 1.14 s, DECIMAL(18) 1.03 s, plain
  * double sums 0.42 s, floor-quantized long sums 0.40 s. The 2.7×
  * over plain doubles is the price of bit-exact cross-engine
  * reproducibility. Long-quantized sums match that speed and are also
  * deterministic, but overflow ~9.2e18 at roughly 1e8 rows × 1e5
  * magnitude × scale 6 — fine at bench scale, wrong at 100 TB, so the
  * checked queries keep DECIMAL(28), which holds to ~1e22. Pipelines
  * that don't need cross-engine hashes should use plain double sums.
  */
object Parity {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.DecimalType

  /** Exact, order-independent sum of a double column, returned as double. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** Order-independent mean: exact decimal sum / count, in double. */
  def davg(c: Column, scale: Int = 4): Column =
    (sum(c.cast(DecimalType(28, scale))).cast("double") / count(c))

  /** SQL twin of [[dsum]] for the DuckDB oracle. */
  def sqlDsum(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(28,$scale))) AS DOUBLE)"

  /** SQL twin of [[davg]]. */
  def sqlDavg(expr: String, scale: Int = 4): String =
    s"(CAST(SUM(CAST(($expr) AS DECIMAL(28,$scale))) AS DOUBLE) / COUNT($expr))"
}
