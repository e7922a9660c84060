package graft.functions

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen expression — the string
  * counterpart of [[CosineSim]] for fuzzy record linkage. Spark ships
  * `levenshtein` but no Jaro–Winkler; the textbook algorithm (match
  * window ⌊max(|a|,|b|)/2⌋−1, half-transposition count, prefix boost
  * 0.1·min(4,ℓ) above the 0.7 threshold, 0.0 for any empty input) is
  * implemented once in [[JaroWinklerAlgo]] and shared by the
  * interpreted path and the generated code, and reproduces DuckDB's
  * `jaro_winkler_similarity` exactly on identical inputs — which is
  * what lets the fuzzy-match query below be oracle-checked value-level
  * (outputs rounded to 6 dp; the two engines' compute orders may differ
  * in the final ulp).
  */
object JaroWinklerAlgo {

  /** Static entry shared by eval and generated code. Inputs non-null. */
  def sim(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - transpositions / 2) / mm) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      while (l < math.min(4, math.min(n, m)) && s.charAt(l) == t.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }
}

/** `jaro_winkler(str, str) -> double`, registered via
  * [[GraftExtensions]]. Codegen emits a single static call — the loop
  * lives in compiled Scala, which keeps the expression inside
  * whole-stage codegen without inlining a page of Java.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.JaroWinklerAlgo.sim($x, $y);")
}

/** Fuzzy-linkage query surface built on the native expression. */
object Fuzzy {

  val defs: Seq[QueryDef] = Seq(

    // Near-identical part names: block candidate pairs on the shared
    // noun (an equi-join — the 100 TB shape: |block|² work per noun,
    // never |names|²), score with native Jaro–Winkler, keep strong
    // matches. DuckDB's jaro_winkler_similarity is the oracle for the
    // expression itself, not just the query.
    QueryDef(
      "q_fuzzy_jw",
      (s, d) => {
        val names = Tables.part(s, d)
          .selectExpr("p_name AS name", "split(p_name, ' ')[1] AS noun")
          .distinct()
        names.as("a").join(names.as("b"),
            col("a.noun") === col("b.noun") && col("a.name") < col("b.name"))
          .selectExpr("a.name AS n1", "b.name AS n2",
            "round(jaro_winkler(a.name, b.name), 6) AS jw")
          .filter(col("jw") >= 0.8)
          .orderBy(col("jw").desc, col("n1"), col("n2"))
      },
      Some("""WITH names AS (
             |  SELECT DISTINCT p_name AS name, string_split(p_name, ' ')[2] AS noun
             |  FROM part)
             |SELECT a.name AS n1, b.name AS n2,
             |  round(jaro_winkler_similarity(a.name, b.name), 6) AS jw
             |FROM names a JOIN names b ON a.noun = b.noun AND a.name < b.name
             |WHERE round(jaro_winkler_similarity(a.name, b.name), 6) >= 0.8
             |ORDER BY jw DESC, n1, n2""".stripMargin))
  )
}
