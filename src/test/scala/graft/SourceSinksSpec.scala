package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.SourceSinks

class SourceSinksSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    (1L, "2024-01-01", 5L, 10.0), (2L, "2024-01-01", 6L, 200.0),
    (3L, "2024-01-02", 5L, 150.0), (4L, "2024-01-03", 7L, 20.0)
  ).toDF("event_id", "day", "user_id", "value")

  test("partitioned parquet round-trips and prunes partitions on read") {
    val dir = Files.createTempDirectory("graft_part").toString
    SourceSinks.writeParquetPartitioned(events, dir, "day")
    val back = SourceSinks.readParquet(spark, dir)
    assert(back.count() === 4)
    val pruned = back.filter(col("day") === "2024-01-01")
    assert(pruned.count() === 2)
    // pruning is visible in the scan: only one partition directory read
    val scanDesc = pruned.queryExecution.executedPlan.toString
    assert(scanDesc.contains("PartitionFilters"), scanDesc.take(400))
  }

  test("orc round-trips, prunes partitions, and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString
    SourceSinks.writeOrcPartitioned(events, dir, "day")
    val back = SourceSinks.readOrc(spark, dir)
    assert(back.orderBy("event_id").collect().map(_.getLong(0)).toSeq
      === Seq(1L, 2L, 3L, 4L))
    val pruned = back.filter(col("day") === "2024-01-01" && col("value") > 100.0)
      .select("event_id", "value")
    val scanDesc = pruned.queryExecution.executedPlan.toString
    assert(scanDesc.contains("PartitionFilters"), scanDesc.take(400))
    // the value predicate must reach the ORC reader, not evaluate post-scan
    assert(scanDesc.contains("PushedFilters: [IsNotNull(value), GreaterThan(value,100.0)")
      || scanDesc.contains("GreaterThan(value,100.0)"), scanDesc.take(800))
    assert(pruned.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("shard write round-trip: files on disk match the q100 manifest shard-by-shard") {
    // release integrity: q100's manifest is the bookkeeping twin of the
    // partitioned shard write — publish both, then verify each shard
    // DIRECTORY's actual rows against its manifest row (doc count, token
    // and char volume, id range), and that no unmanifested shard exists
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("graft_shards").toString
    SourceSinks.writeParquetPartitioned(
      graft.ops.PipelineOps.shardAssign(docs), dir, "shard")
    val manifest = graft.ops.PipelineOps.shardManifest(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(manifest.nonEmpty)
    manifest.foreach { case (shard, nDocs, totTok, totChars, minId, maxId) =>
      val part = spark.read.parquet(s"$dir/shard=$shard")
      val (n, tok, chars, lo, hi) = part
        .agg(count(lit(1)), sum("n_tokens"), sum("n_chars"),
          min("doc_id"), max("doc_id"))
        .as[(Long, Long, Long, Long, Long)].head()
      assert((n, tok, chars, lo, hi) === ((nDocs, totTok, totChars, minId, maxId)),
        s"shard $shard files disagree with the manifest")
    }
    // the directory listing carries exactly the manifested shards
    val onDisk = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).toSet
    assert(onDisk === manifest.map(m => s"shard=${m._1}").toSet)
  }

  test("csv and json round-trip with explicit schemas (no inference pass)") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("day", StringType),
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val cdir = Files.createTempDirectory("graft_csv").toString
    SourceSinks.writeCsv(events, cdir)
    val cback = SourceSinks.readCsv(spark, cdir, schema).orderBy("event_id")
    assert(cback.collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    val jdir = Files.createTempDirectory("graft_json").toString
    SourceSinks.writeJsonLines(events, jdir)
    val jback = SourceSinks.readJsonLines(spark, jdir, schema)
    assert(jback.count() === 4)
  }

  test("gzip JSONL round-trips: compressed files on disk, same rows back") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("day", StringType),
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val dir = Files.createTempDirectory("graft_jsongz").toString
    SourceSinks.writeJsonLines(events, dir, codec = "gzip")
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")), files.mkString(","))
    val back = SourceSinks.readJsonLines(spark, dir, schema).orderBy("event_id")
    assert(back.collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("mergeSchema read unions evolving parquet schemas; old files yield nulls") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString
    // day-1 drop: two columns; day-2 drop adds a quality score
    Seq((1L, "a")).toDF("doc_id", "text")
      .write.parquet(s"$dir/part=1")
    Seq((2L, "b", 0.9)).toDF("doc_id", "text", "quality")
      .write.parquet(s"$dir/part=2")
    val merged = SourceSinks.readParquetMerged(spark, dir).orderBy("doc_id")
    assert(merged.columns.toSet === Set("doc_id", "text", "quality", "part"))
    val rows = merged.collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("quality"))) // pre-evolution file
    assert(rows(1).getDouble(rows(1).fieldIndex("quality")) === 0.9)
  }

  test("csv round-trip preserves the null vs empty-string distinction") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val df = Seq((1L, "x"), (2L, ""), (3L, null)).toDF("id", "s")
    val dir = Files.createTempDirectory("graft_csv_null").toString
    SourceSinks.writeCsv(df, dir)
    val back = SourceSinks.readCsv(spark, dir, schema).orderBy("id").collect()
    assert(back(0).getString(1) === "x")
    assert(back(1).getString(1) === "")   // empty string survives as ""
    assert(back(2).isNullAt(1))           // null survives as null
  }

  test("csv escape handles dotted column names (literal reference, not a path)") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s.dotted", StringType)))
    val df = Seq((1L, "\\N"), (2L, "x")).toDF("id", "s.dotted")
    val dir = Files.createTempDirectory("graft_csv_dotted").toString
    SourceSinks.writeCsv(df, dir)
    val back = SourceSinks.readCsv(spark, dir, schema).orderBy("id").collect()
    assert(back(0).getString(1) === "\\N" && back(1).getString(1) === "x")
  }

  test("csv round-trip is lossless for the null-sentinel family of strings") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    // the regression this guards: a genuine "\N" string used to round-trip
    // to null (the on-disk token collided with the nullValue sentinel)
    val tricky: Seq[(Long, String)] = Seq(
      1L -> "\\N", 2L -> "\\\\N", 3L -> "\\\\\\N", // \N, \\N, \\\N
      4L -> "N", 5L -> "\\", 6L -> "\\N ", 7L -> " \\N", 8L -> "x\\Ny",
      9L -> "", 10L -> null, 11L -> "plain", 12L -> "\\M", 13L -> "a,b")
    val df = tricky.toDF("id", "s")
    val dir = Files.createTempDirectory("graft_csv_sentinel").toString
    SourceSinks.writeCsv(df, dir)
    val back = SourceSinks.readCsv(spark, dir, schema).orderBy("id").collect()
    tricky.sortBy(_._1).zip(back).foreach { case ((id, want), row) =>
      if (want == null) assert(row.isNullAt(1), s"id=$id: expected null")
      else assert(row.getString(1) === want, s"id=$id: ${row.getString(1)} != $want")
    }
  }

  test("bucketed tables join with zero shuffle exchanges") {
    SourceSinks.writeBucketed(events.select("event_id", "user_id", "value"),
      "ev_bucketed", "user_id")
    SourceSinks.writeBucketed(Seq((5L, "alice"), (6L, "bob"), (7L, "carol"))
      .toDF("user_id", "name"), "users_bucketed", "user_id")
    val joined = spark.table("ev_bucketed")
      .join(spark.table("users_bucketed"), "user_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n${plan.take(800)}")
    assert(joined.count() === 4)
  }

  test("q224 graded bucketed diff: the full-outer runs with ZERO shuffle exchanges and equals q212 row for row") {
    // the 100 TB reconciliation shape, now the graded query's own path:
    // both sides land bucketed on the natural key (SparkEntry's once-per-
    // corpus storage stage), so the diff's one corpus-scale full-outer
    // join is a co-partitioned sort-merge with no Exchange — the same
    // rows, without the shuffle the unbucketed q212 plan pays
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val want = graft.ops.ProfileOps.tableDiff(orders).collect().map(_.toSeq).toSeq
    val (a, b) = SparkEntry.bucketedDiffTables(spark, "/root/testdata/sf0.001")
    // plan guard on the corpus-scale stage (the shipped census checkpoints
    // the 4-row table, which truncates the visible plan — same discipline
    // as PlanShapeSpec's q212 guard)
    val j = graft.ops.ProfileOps.tableDiffJoined(a, b)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed diff must join shuffle-free:\n${plan.take(1000)}")
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
      s"the diff must stay a co-partitioned sort-merge full-outer:\n${plan.take(1000)}")
    // the graded query returns EXACTLY q212's census (same oracle SQL)
    val got = SparkEntry.queries("q224_bucketed_diff")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    assert(got === want, "bucketed census must equal the live q212 census")
  }

  test("q224 survives a STALE warehouse location: a prior session's table dir without a catalog entry must not kill the landing") {
    // the r15 quiet-bench failure: the in-memory catalog forgets managed
    // tables across sessions but their warehouse directories survive, and
    // saveAsTable then throws LOCATION_ALREADY_EXISTS. Simulate: drop the
    // tables (which removes dirs), recreate a bare stale directory with a
    // junk file, and re-land.
    val d = "/root/testdata/sf0.001"
    val tag = f"${d.hashCode & 0x7fffffff}%08x"
    spark.sql(s"DROP TABLE IF EXISTS graft_diff_a_$tag")
    spark.sql(s"DROP TABLE IF EXISTS graft_diff_b_$tag")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val stale = new java.io.File(wh, s"graft_diff_a_$tag")
    stale.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(stale, "leftover.parquet").toPath, "junk")
    val (a, b) = SparkEntry.bucketedDiffTables(spark, d)
    assert(a.count() > 0 && b.count() > 0,
      "landing over a stale location must recreate both tables")
  }
}
