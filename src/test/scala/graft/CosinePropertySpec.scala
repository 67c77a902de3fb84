package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions.col

/** Property-style check: the native CosineSimilarity expression agrees with a
  * plain Scala reference implementation (same left-to-right fold) on
  * ScalaCheck-generated vectors (fixed seed → reproducible), across the
  * interpreted and codegen evaluation paths. */
class CosinePropertySpec extends SparkSpec {

  private def referenceCosine(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private val vecGen: Gen[Array[Double]] = for {
    n <- Gen.choose(1, 32)
    xs <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
  } yield xs.toArray

  private val pairsGen: Gen[List[(Array[Double], Array[Double])]] =
    Gen.listOfN(64, Gen.zip(vecGen, vecGen))

  test("native cosine equals the scala reference on generated vectors") {
    import spark.implicits._
    val pairs = pairsGen(Gen.Parameters.default, Seed(42L))
      .getOrElse(fail("generator exhausted"))
    val df = pairs.toDF("a", "b")
    val got = df.select(GraftFunctions.cosine(spark, col("a"), col("b")))
      .collect().map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0))
    val want = pairs.map { case (a, b) => referenceCosine(a, b) }
    got.zip(want).foreach { case (g, w) =>
      assert(g == w || (g.isNaN && w.isNaN), s"got $g want $w")
    }
  }
}
