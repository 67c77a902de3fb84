package graft

/** The correctness-dump error contract (round-6 lesson: a query that threw
  * during Verify wrote nothing, its key vanished from the driver's report,
  * and 7 breakages hid behind absent keys): a crashed query must leave a
  * parquet-free result dir with a named _error.txt marker so every
  * downstream reader fails LOUDLY on the key instead of skipping it. */
class VerifySpec extends SparkSpec {

  private val outDir = "/root/repo/target/test_verify_dump"

  test("a successful query dumps parquet, a crashing one leaves an error marker") {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    Verify.dumpOne(spark, sfDir, outDir, "ok_query",
      (s, _) => { import s.implicits._; Seq((1L, "a")).toDF("id", "v") })
    val okFiles = new java.io.File(outDir, "ok_query").listFiles()
    assert(okFiles.exists(_.getName.endsWith(".parquet")), "no parquet written")

    Verify.dumpOne(spark, sfDir, outDir, "boom_query",
      (_, _) => throw new IllegalStateException("deliberate test failure"))
    val dir = new java.io.File(outDir, "boom_query")
    assert(dir.isDirectory, "crashed query must still leave a result dir")
    val files = dir.listFiles().map(_.getName).toSet
    assert(files == Set("_error.txt"),
      s"crashed dir must hold ONLY the error marker, got $files")
    val msg = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$outDir/boom_query/_error.txt"))
    assert(msg.contains("boom_query") && msg.contains("deliberate test failure"),
      s"marker must name the query and the exception: $msg")
  }

  test("a crash after a previous good dump replaces the stale parquet with the marker") {
    // a stale previous-round result must not survive a crash and be compared
    // as if it were this round's output
    Verify.dumpOne(spark, sfDir, outDir, "flip_query",
      (s, _) => { import s.implicits._; Seq((1L, "stale")).toDF("id", "v") })
    Verify.dumpOne(spark, sfDir, outDir, "flip_query",
      (_, _) => throw new RuntimeException("second run crashed"))
    val files = new java.io.File(outDir, "flip_query").listFiles().map(_.getName).toSet
    assert(files == Set("_error.txt"),
      s"stale parquet must be gone after a crash, got $files")
  }
}
