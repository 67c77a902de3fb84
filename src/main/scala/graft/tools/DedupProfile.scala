package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling for the dedup pipeline stages. Not part of the public API. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $label"); r
    }

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"docs: ${d.count()}")

    val toks = d.select(col("doc_id"), split(col("text"), " ").as("t"))
    val sh = toks.select(col("doc_id"),
      array_distinct(when(size(col("t")) >= 3,
        transform(sequence(lit(0), size(col("t")) - 3),
          i => concat_ws(" ", slice(col("t"), i + lit(1), lit(3)))))
        .otherwise(array(concat_ws(" ", col("t"))))).as("sh"))
    time("shingles only")(sh.select(sum(size(col("sh")))).head())

    val base = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("b"))
    val minsA = (0 until 64).map(i => min(xxhash64(col("b"), lit(i))).as(s"m$i"))
    val sig = base.groupBy(col("doc_id")).agg(minsA.head, minsA.tail: _*)
      .select(col("doc_id"), array((0 until 64).map(i => col(s"m$i")): _*).as("sig")).cache()
    time("minhash sigs (cached)")(sig.count())

    val banded = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(concat_ws(",",
          transform(slice(col("sig"), b * lit(4) + lit(1), lit(4)),
            v => v.cast("string")))))))
      .toDF("doc_id", "band_id", "band_key")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("band_id"), col("band_key"))
    val bounded = banded.withColumn("n", count(lit(1)).over(w)).filter(col("n") <= 64).drop("n")
    time("banded+bounded")(println(s"  bounded rows: ${bounded.count()}"))

    val cands = bounded.as("x").join(bounded.as("y"),
        col("x.band_id") === col("y.band_id") && col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct().cache()
    time("candidate pairs")(println(s"  pairs: ${cands.count()}"))

    val est = cands
      .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("est", aggregate(zip_with(col("sig_a"), col("sig_b"),
        (x, y) => when(x === y, 1).otherwise(0)), lit(0), (a, v) => a + v))
      .select(col("doc_a"), col("doc_b"), col("est"))
    val short = time("est + top500")(est.orderBy(col("est").desc, col("doc_a"), col("doc_b")).limit(500).cache())
    time("shortlist count")(short.count())

    val verified = short
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))))
    time("exact verify 500")(verified.orderBy(col("jaccard").desc).limit(50).collect())
    spark.stop()
  }
}
