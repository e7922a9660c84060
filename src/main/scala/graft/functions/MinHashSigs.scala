package graft.functions

import graft.operators.Dedup
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the full 16-permutation MinHash
  * signature of a shingle-hash array in ONE fused pass — the HOF
  * formulation runs 16 separate `array_min(transform(...))` scans per
  * row, each an interpreted per-element lambda; this keeps all 16
  * running minima in locals and reads the array once.
  *
  * Permutation constants and modulus are the library's fixed MinHash
  * parameters ([[graft.operators.Dedup.MinhashPerms]]) — identical to
  * the HOF path and the DuckDB oracle, so signatures (and therefore
  * LSH bands and candidate sets) are bit-identical. Null or empty
  * input yields null (the HOF's array_min over an empty transform is
  * null per element; downstream band strings coincide either way —
  * NativeFunctionsSpec pins the live corpus equality).
  */
case class MinHashSigs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects array<bigint>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "minhash_sigs"

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)

  private val as = Dedup.MinhashPerms.map(_._1).toArray
  private val bs = Dedup.MinhashPerms.map(_._2).toArray
  private val p = Dedup.MinhashP

  // Null ELEMENTS are skipped, matching the HOF twin: `transform` maps a
  // null shingle hash to a null permuted hash and `array_min` skips null
  // elements — so the minimum ranges over the non-null members only, and
  // the signature is null exactly when no non-null member exists (the
  // all-null array_min). Reading getLong past isNullAt would instead
  // fold a phantom 0 hash into every permutation.
  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val mins = Array.fill(as.length)(Long.MaxValue)
    var seen = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        seen += 1
        val s = x.getLong(i)
        var k = 0
        while (k < mins.length) {
          val h = (as(k) * s + bs(k)) % p
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    if (seen == 0) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val seen = ctx.freshName("seen")
      val updates = as.indices.map { k =>
        s"""{ long h = (${as(k)}L * $s + ${bs(k)}L) % ${p}L;
           |  if (h < $m[$k]) $m[$k] = h; }""".stripMargin
      }.mkString("\n")
      s"""
         |int $n = $x.numElements();
         |long[] $m = new long[${as.length}];
         |java.util.Arrays.fill($m, Long.MAX_VALUE);
         |int $seen = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) continue;
         |  $seen++;
         |  long $s = $x.getLong($i);
         |  $updates
         |}
         |if ($seen == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($m);
         |}
       """.stripMargin
    })
}
