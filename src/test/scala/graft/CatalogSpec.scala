package graft

import org.apache.spark.sql.functions._

import graft.edfs.{GraftCatalog, HashPartition, RangePartition, BucketedHashPartition}

class CatalogSpec extends SparkSpec {

  private def freshCatalog(name: String): GraftCatalog = {
    val root = s"/root/repo/target/test_edfs/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    new GraftCatalog(spark, root)
  }

  test("mkdir/ls/rm namespace semantics") {
    val cat = freshCatalog("ns")
    assert(cat.mkdir("a/b/c"))
    val names = cat.ls("a").collect().map(_.getString(0)).toSeq
    assert(names == Seq("b"))
    // rm refuses non-empty dir without recursive (reference rm behavior)
    assert(!cat.rm("a"))
    assert(cat.rm("a/b/c"))
    assert(cat.rm("a", recursive = true))
  }

  test("hash-partitioned put/cat round trip is lossless") {
    val cat = freshCatalog("roundtrip")
    val src = Tables.load(spark, sfDir, "customer")
    cat.put(src, "t", HashPartition("c_nationkey"))
    val back = cat.cat("t")
    assert(back.count() == src.count())
    assert(back.select(sum("c_custkey")).head().getLong(0) ==
      src.select(sum("c_custkey")).head().getLong(0))
  }

  test("readPartition prunes to the single matching directory") {
    val cat = freshCatalog("prune")
    cat.put(Tables.load(spark, sfDir, "customer"), "t", HashPartition("c_nationkey"))
    val part = cat.readPartition("t", "c_nationkey", 3)
    assert(part.select("c_nationkey").distinct().collect().map(_.get(0)).toSeq == Seq(3))
    // partition pruning must show up in the physical plan
    val plan = part.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("c_nationkey"),
      s"expected partition filters in plan:\n$plan")
  }

  test("range partitioning buckets cover all rows and bound each bucket") {
    val cat = freshCatalog("range")
    val src = Tables.load(spark, sfDir, "orders")
    cat.put(src, "t", RangePartition("o_totalprice", 8))
    assert(cat.cat("t").count() == src.count())
    val nParts = cat.partitionLocations("t").count()
    assert(nParts >= 1 && nParts <= 8, s"got $nParts range buckets")
  }

  test("range partitioning survives empty and all-null inputs") {
    val cat = freshCatalog("range_edge")
    val src = Tables.load(spark, sfDir, "orders")
    cat.put(src.filter(lit(false)), "empty", RangePartition("o_totalprice", 8))
    assert(cat.cat("empty").count() == 0)
    val nulls = src.limit(7).withColumn("o_totalprice", lit(null).cast("double"))
    cat.put(nulls, "nulls", RangePartition("o_totalprice", 8))
    assert(cat.cat("nulls").count() == 7)
  }

  test("compact collapses multi-file partitions to one file, losslessly") {
    val cat = freshCatalog("compact")
    val src = Tables.load(spark, sfDir, "customer")
    cat.put(src.repartition(4), "t", HashPartition("c_nationkey"))
    val before = cat.partitionLocations("t").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(before.values.exists(_ > 1), s"fixture should start multi-file: $before")
    cat.compact("t")
    val after = cat.partitionLocations("t").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(after.keySet == before.keySet, "partition set must be preserved")
    assert(after.values.forall(_ == 1), s"expected 1 file per partition: $after")
    assert(cat.cat("t").count() == src.count())
    assert(cat.describe("t").collect().map(r => r.getString(0) -> r.getString(1))
      .toMap.apply("scheme") == "hash") // sidecar survived the swap
  }

  test("append reproduces bucketed and range layouts (no flat files at the root)") {
    val cat = freshCatalog("append_layout")
    val src = Tables.load(spark, sfDir, "orders")
    cat.put(src, "b", BucketedHashPartition("o_orderkey", 8))
    cat.append(src.limit(20), "b")
    assert(cat.cat("b").count() == src.count() + 20)
    assert(cat.partitionLocations("b").count() <= 8)
    cat.put(src, "r", RangePartition("o_totalprice", 8))
    val binsBefore = cat.partitionLocations("r").collect().map(_.getString(0)).toSet
    cat.append(src.limit(20), "r")
    assert(cat.cat("r").count() == src.count() + 20)
    // appended rows land in the ORIGINAL bins (bounds persisted in sidecar)
    val binsAfter = cat.partitionLocations("r").collect().map(_.getString(0)).toSet
    assert(binsAfter == binsBefore, s"new bins appeared: ${binsAfter -- binsBefore}")
  }

  test("compact after schema evolution preserves the evolved shape") {
    val cat = freshCatalog("evolve_compact")
    val src = Tables.load(spark, sfDir, "nation")
    cat.put(src, "t", HashPartition("n_regionkey"))
    cat.append(src.withColumn("n_flag", col("n_nationkey") * 10), "t")
    cat.compact("t")
    val back = cat.cat("t")
    assert(back.count() == src.count() * 2)
    assert(back.columns.contains("n_flag"))
    // old rows surface the evolved column as null, new rows carry values
    assert(back.filter(col("n_flag").isNull).count() == src.count())
    assert(back.filter(col("n_flag").isNotNull).count() == src.count())
    assert(cat.partitionLocations("t").collect().forall(_.getInt(1) == 1))
  }

  test("putCsv ingests a headered CSV and catOrdered restores file order") {
    val cat = freshCatalog("csv")
    val csvDir = "/root/repo/target/test_edfs/csv_src"
    Tables.load(spark, sfDir, "region")
      .orderBy("r_regionkey")
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(csvDir)
    cat.putCsv(csvDir, "t", HashPartition("r_regionkey"))
    val back = cat.catOrdered("t").collect()
    assert(back.length == 5)
    // ingest order restored despite hash-partitioned storage
    assert(back.map(_.getAs[Any]("r_regionkey").toString.toInt).toSeq == Seq(0, 1, 2, 3, 4))
    assert(!back.head.schema.fieldNames.exists(_.startsWith("__graft")))
  }

  test("describe exposes the metadata sidecar of a written table") {
    val cat = freshCatalog("meta")
    cat.put(Tables.load(spark, sfDir, "customer"), "t", HashPartition("c_nationkey"))
    val kv = cat.describe("t").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kv("scheme") == "hash")
    assert(kv("partition_column") == "c_nationkey")
    assert(kv("committed") == "true")
    assert(kv("num_partitions").toInt > 1)
  }

  test("bucketed hash partitioning bounds fan-out for high-cardinality keys") {
    val cat = freshCatalog("bucketed")
    val src = Tables.load(spark, sfDir, "orders")
    cat.put(src, "t", BucketedHashPartition("o_orderkey", 16))
    assert(cat.partitionLocations("t").count() <= 16)
    assert(cat.cat("t").count() == src.count())
    // internal bucket column must not leak into user data
    assert(!cat.cat("t").columns.exists(_.startsWith("__graft")))
  }
}
