package graft.reference

import org.apache.spark.sql.types._

/** The heat-pump sensor schema, declared once (the reference hand-builds
  * it in all four scripts: producer 26-field variant at
  * `temDataRead.py:34-43` / `04_temincrementaltem.py:36-45`, consumer
  * 25-field variant at `temReadFromTopic.py:68-75` /
  * `03_temStreamEveryMin.py:76-83`).
  *
  * Fidelity quirks preserved deliberately (SURVEY.md §1.2):
  *  - `TbottomTestTankHpCir` is STRING though the data is numeric — the
  *    JSON wire shape depends on it (value serializes quoted);
  *  - `dateTime` stays STRING end-to-end (the reference imports
  *    TimestampType but never casts);
  *  - all FloatType, never widened to double at ingest;
  *  - fields are nullable: the reference declares nullable=False, but
  *    Spark's CSV/JSON readers return nullable columns regardless, and
  *    `data/csv2.csv` genuinely lacks the last two columns (they read as
  *    null) — PERMISSIVE semantics are the real contract.
  */
object SensorSchema {

  /** The ten stratification sensors averaged by `Tem(Avg)`. */
  val TCols: Seq[String] = (0 to 9).map(i => s"T$i")

  /** Consumer-side schema: 25 fields, no pandas index column. */
  val consumer: StructType = StructType(
    Seq(
      StructField("id", IntegerType),
      StructField("dateTime", StringType),
      StructField("Tamb", FloatType),
      StructField("TtopTestTankHPCir", FloatType),
      StructField("TbottomTestTankHpCir", StringType),
      StructField("TtopSourceTank", FloatType),
      StructField("TloadTankMix", FloatType),
      StructField("TTopTestTankLoadCir", FloatType),
      StructField("TloadMix", FloatType),
      StructField("TbottomSourceTank", FloatType),
      StructField("TbottomTestTankLoadCir", FloatType)) ++
      TCols.map(StructField(_, FloatType)) ++
      Seq(
        StructField("flowHP", FloatType),
        StructField("flowLoad", FloatType),
        StructField("Load_kW", FloatType),
        StructField("Heat_Capacity_kW", FloatType)))

  /** Producer-side schema: the consumer fields prefixed with the pandas
    * index column `"Unnamed: 0"` that the CSV fixtures carry. */
  val producer: StructType =
    StructType(StructField("Unnamed: 0", IntegerType) +: consumer.fields)
}
