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

  test("dedup_lines' decimal keeper pack/unpack round-trips and preserves order on generated ids") {
    import spark.implicits._
    // the C48 keeper contract: pack(doc_id, idx) = doc_id*10^9 + idx as
    // decimal(38,0) must be (a) strictly monotone in (doc_id, idx)
    // lexicographic order and (b) floor-unpackable back to the exact pair
    // — for ANY long doc_id, negatives (hashed crawl ids) included. The
    // fixture test pins three hand-picked ids; this pins the algebra on
    // generated extremes (Long.MinValue-adjacent included).
    val idGen = Gen.oneOf(
      Gen.choose(Long.MinValue + 1, Long.MaxValue),
      Gen.choose(-1000L, 1000L),
      Gen.oneOf(Long.MinValue + 1, -1L, 0L, 1L, Long.MaxValue))
    val pairGen = Gen.zip(idGen, Gen.choose(0, 999999999))
    val pairs = Gen.listOfN(256, pairGen)(Gen.Parameters.default, Seed(13L))
      .getOrElse(fail("generator exhausted")).distinct
    val df = pairs.toDF("doc_id", "idx")
    // the EXACT expressions dedupLinesOn builds: pack, then floor-unpack
    val packed = df.select(col("doc_id"), col("idx"),
      (col("doc_id").cast("decimal(29,0)") * org.apache.spark.sql.functions.lit(1000000000L)
        + col("idx")).as("pk"))
    val back = packed
      .select(col("doc_id"), col("idx"),
        org.apache.spark.sql.functions.pmod(col("pk"),
          org.apache.spark.sql.functions.lit(1000000000L)).as("kidx0"), col("pk"))
      .select(col("doc_id"), col("idx"), col("pk"),
        ((col("pk") - col("kidx0")) / 1000000000L).cast("long").as("kdoc"),
        col("kidx0").cast("long").as("kidx"))
      .collect()
    back.foreach { r =>
      assert(r.getLong(3) == r.getLong(0) && r.getLong(4) == r.getInt(1).toLong,
        s"unpack drifted: (${r.getLong(0)}, ${r.getInt(1)}) -> (${r.getLong(3)}, ${r.getLong(4)})")
    }
    // order preservation: pk comparison == lexicographic pair comparison
    val pks = back.map(r => ((r.getLong(0), r.getInt(1)), r.getDecimal(2))).toSeq
    val byPair = pks.sortBy(_._1)
    val byPk = pks.sortBy(_._2)
    assert(byPair.map(_._1) == byPk.map(_._1),
      "pack is not monotone in (doc_id, idx) lexicographic order")
  }

  test("native ADC-table kernel equals the composed form on generated vectors and books") {
    import spark.implicits._
    // FunctionsSpec pins one deterministic fixture; this pins the bit
    // identity on ScalaCheck-generated queries AND books (extreme
    // magnitudes included — the fold's IEEE sequence must match even
    // where rounding is lossy)
    val valGen = Gen.oneOf(Gen.choose(-1.0, 1.0), Gen.choose(-1e6, 1e6),
      Gen.const(0.0))
    val vecGen64 = Gen.listOfN(64, valGen).map(_.toArray)
    val booksGen = Gen.listOfN(8 * 16, Gen.listOfN(8, valGen).map(_.toArray))
      .map(flat => Array.tabulate(8, 16)((m, c) => flat(m * 16 + c)))
    val (qs, books) = (for {
      q <- Gen.listOfN(12, vecGen64)
      b <- booksGen
    } yield (q, b))(Gen.Parameters.default, Seed(29L))
      .getOrElse(fail("generator exhausted"))
    val df = qs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("q_id", "q")
    val got = df.select(col("q_id"),
        GraftFunctions.adcTable(spark, col("q"), books).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val want = df.select(col("q_id"),
        graft.operators.Similarity.adcTableExpr(books).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    got.foreach { case (id, g) =>
      g.zip(want(id)).zipWithIndex.foreach { case ((gv, wv), k) =>
        assert(java.lang.Double.doubleToRawLongBits(gv) ==
          java.lang.Double.doubleToRawLongBits(wv),
          s"q $id entry $k: kernel $gv != composed $wv")
      }
    }
  }
}
