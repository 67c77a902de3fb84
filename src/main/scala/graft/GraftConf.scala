package graft

import org.apache.spark.sql.SparkSession

/** Session tuning for graft workloads — the knobs that matter at 100 TB,
  * applied consistently by Verify/Bench/tests. Values are cluster-relative:
  * `shufflePartitions` should be ~2-3× total executor cores in production (the
  * local harness passes the core count).
  */
object GraftConf {

  /** Scratch root for warehouse / EDFS catalog / streaming checkpoints.
    * Overridable via `-Dgraft.local.root=...`; defaults to `<cwd>/target` so
    * any checkout or user works — nothing is tied to one machine's layout. */
  def localRoot: String =
    sys.props.get("graft.local.root")
      .getOrElse(sys.props.getOrElse("user.dir", ".") + "/target")

  /** Delete an ORPHAN managed-table directory under the warehouse (left by a
    * previous session, unknown to this session's in-memory catalog) so
    * `saveAsTable` can claim the location. The warehouse URI is resolved
    * through Hadoop's Path/FileSystem, so a plain path, a `file:` URI and a
    * remote scheme all route to the right filesystem — string-stripping the
    * scheme handled only the bare `file:` form and would have skipped or
    * mis-targeted the delete (and left `saveAsTable` refusing the location)
    * for every other warehouse URI. */
  def deleteOrphanTableDir(spark: SparkSession, tbl: String): Unit = {
    // the warehouse conf is a URI STRING (Spark escapes it), so decode it
    // through java.net.URI first — Path(String) would keep the escapes as
    // literal path characters (a dir with '%' or a space mis-targets);
    // fall back to the raw-path form for values URI refuses to parse
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val parent =
      try new org.apache.hadoop.fs.Path(new java.net.URI(wh))
      catch {
        case _: java.net.URISyntaxException | _: IllegalArgumentException =>
          new org.apache.hadoop.fs.Path(wh)
      }
    val p = new org.apache.hadoop.fs.Path(parent, tbl)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Apply graft defaults to a session builder. AQE stays ON (runtime
    * coalescing + skew-join splitting are the first line of defense against
    * skew at scale); broadcast threshold is left at Spark's default — the
    * explicit `broadcast()` hints in operators mark the joins we KNOW are
    * dim-sized, which survives stale statistics. */
  def apply(b: SparkSession.Builder, shufflePartitions: String): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.warehouse.dir", s"$localRoot/graft_warehouse")
      .config("spark.ui.enabled", "false")
}
