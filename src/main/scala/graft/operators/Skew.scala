package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (builder prompt: "skewed keys →
  * salting or AQE skew-join"). AQE's skew-join split handles most cases
  * at runtime; explicit salting remains the tool when one key dominates
  * so hard that even split partitions of it won't fit, or when the join
  * runs under a fixed partitioning AQE can't touch.
  *
  * Shape: the big (skewed) side scatters each row to one of `salts`
  * sub-keys; the small side replicates once per salt. The shuffle then
  * partitions by (key, salt), spreading the hot key over `salts`
  * reducers. Cost: small side inflates ×salts — keep it the dimension
  * side.
  */
object Skew {

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn(
      "__salt_b", pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val saltedSmall = small.withColumn(
      "__salt_s", explode(array((0 until salts).map(lit): _*)))
    saltedBig
      .join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey)
          && saltedBig("__salt_b") === saltedSmall("__salt_s"))
      .drop("__salt_b", "__salt_s")
  }
}
