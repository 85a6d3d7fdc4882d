package graft.functions

import graft.SparkTestBase
import graft.functions.GraftExpressions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the NFC normalization expression: composition semantics, the
  * allocation-free already-normalized path, SQL registration, and codegen.
  * All non-ASCII text is spelled with explicit \\u escapes so the
  * decomposed-vs-precomposed distinction survives editors and toolchains.
  */
class TextNormSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val decomposedCafe = "cafe\u0301"   // e + COMBINING ACUTE
  private val precomposedCafe = "caf\u00e9"   // e-acute
  private val decomposedNoel = "no\u0308el"   // o + COMBINING DIAERESIS
  private val precomposedNoel = "n\u00f6el"   // o-diaeresis

  test("decomposed sequences compose; precomposed text is unchanged") {
    assert(TextNorm.nfc(decomposedCafe) === precomposedCafe)
    assert(TextNorm.nfc(decomposedNoel) === precomposedNoel)
    assert(TextNorm.nfc(precomposedCafe) === precomposedCafe)
    assert(TextNorm.nfc("plain ascii") === "plain ascii")
    assert(TextNorm.nfc(null) === null)
    // code-point count shrinks on composition: 5 chars -> 4
    assert(decomposedCafe.length === 5)
    assert(TextNorm.nfc(decomposedCafe).length === 4)
  }

  test("already-NFC UTF8String returns the SAME instance (no allocation)") {
    val s = org.apache.spark.unsafe.types.UTF8String.fromString("plain")
    assert(TextNorm.nfcU(s) eq s)
  }

  test("Column API and spark.sql agree; NFKC compatibility folds do NOT happen") {
    GraftExpressions.registerAll(spark)
    // ﬁ = fi-ligature, ² = superscript two: NFC must KEEP both
    val df = Seq(("a", decomposedCafe), ("b", "\ufb01sh"), ("c", "x\u00b2"))
      .toDF("id", "s")
    val viaCol = df.select(col("id"), nfc_normalize(col("s")).as("n"))
      .as[(String, String)].collect().toMap
    df.createOrReplaceTempView("tn")
    val viaSql = spark.sql("SELECT id, nfc_normalize(s) AS n FROM tn")
      .as[(String, String)].collect().toMap
    assert(viaCol === viaSql)
    assert(viaCol("a") === precomposedCafe)
    assert(viaCol("b") === "\ufb01sh")
    assert(viaCol("c") === "x\u00b2")
  }

  test("expression fuses into WholeStageCodegen") {
    val plan = spark.range(10)
      .select(nfc_normalize(concat(lit("\u00e9"), col("id"))).as("n"))
      .filter(length(col("n")) > 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
  }
}
