package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine._
import graft.engine.IngestOps.{FixtureSource, OrderRec}

/** Round-2 operator semantics: batched ingest (S3/S4), MV rebuild
  * (S2), geocoding enrichment (S6), dashboard second-stage rollups. */
class IngestWriteSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_${tag}_").toString + "/out"

  test("ingest loop pages, retries one transient failure, and lands every row") {
    val rows = (0 until 2345).map(i =>
      OrderRec(i.toLong, i.toLong % 100, s"P${i % 5}", i * 1.5))
    val out = tmpDir("ingest")
    val n = IngestOps.runIngest(spark, new FixtureSource(rows, pageSize = 100),
      out, batchSize = 1000)
    assert(n == 2345, "retry must recover the failing page, not drop it")
    val landed = spark.read.parquet(out)
    assert(landed.count() == 2345)
    assert(landed.select(col("o_orderpriority")).distinct().count() == 5,
      "partition column round-trips through partitionBy")
    val sums = landed.agg(sum(col("o_orderkey"))).head.getLong(0)
    assert(sums == rows.map(_.o_orderkey).sum, "no row lost or duplicated")
  }

  test("ingest gives up after maxRetries persistent failures") {
    val alwaysFail = new IngestOps.PagedSource {
      def fetchPage(page: Int): Option[Seq[OrderRec]] =
        throw new java.io.IOException("persistent")
    }
    intercept[java.io.IOException] {
      IngestOps.fetchWithRetry(alwaysFail, 0, maxRetries = 2)
    }
  }

  test("ingest is idempotent: re-running overwrites, not doubles") {
    val rows = (0 until 500).map(i => OrderRec(i.toLong, 0L, s"P${i % 3}", 1.0))
    val out = tmpDir("ingest2")
    IngestOps.runIngest(spark, new FixtureSource(rows, 100), out, batchSize = 1000)
    IngestOps.runIngest(spark, new FixtureSource(rows, 100), out, batchSize = 1000)
    assert(spark.read.parquet(out).count() == 500)
  }

  test("MV rebuild round-trip hash-matches the in-memory aggregate") {
    val agg = RelationalOps.geoRollup(
      Tables.lineitem(spark, sf), Tables.supplier(spark, sf), Tables.nation(spark, sf))
    val back = WriteOps.rebuild(agg, tmpDir("mv"), Seq("n_name"))
      .select(col("s_name"), col("n_name"), col("total_amount"), col("n_items"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("s_name")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(key(back) == key(agg.select(col("s_name"), col("n_name"),
      col("total_amount"), col("n_items"))))
  }

  test("incremental MV refresh rewrites ONLY the touched partition (others byte-identical)") {
    val agg = RelationalOps.geoRollup(
      Tables.lineitem(spark, sf), Tables.supplier(spark, sf), Tables.nation(spark, sf))
    val path = tmpDir("mv_dyn")
    WriteOps.rebuild(agg, path, Seq("n_name"))
    def files(pred: java.nio.file.Path => Boolean): Map[String, String] = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(path)
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) && pred(p)
          && !p.getFileName.toString.startsWith("_") && !p.getFileName.toString.startsWith("."))
        .map { p =>
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(p))
          root.relativize(p).toString -> md5.map("%02x".format(_)).mkString
        }.toMap
    }
    // pick a key that exists at this scale factor (sf0.001 has only
    // 10 suppliers, so not every nation appears in the rollup)
    val hotName = agg.agg(min(col("n_name"))).head.getString(0)
    val hot = s"n_name=$hotName/"
    val untouchedBefore = files(!_.toString.contains(hot))
    val touchedBefore = files(_.toString.contains(hot))
    assert(untouchedBefore.nonEmpty && touchedBefore.nonEmpty)
    WriteOps.refreshPartitions(agg.filter(col("n_name") === hotName), path, Seq("n_name"))
    // dynamic overwrite: every partition we did NOT write is untouched
    // on disk — same files, same bytes — while the refreshed key's
    // directory was rewritten (new task files)
    assert(files(!_.toString.contains(hot)) == untouchedBefore,
      "untouched partitions must be byte-identical after a keyed refresh")
    assert(files(_.toString.contains(hot)).keySet != touchedBefore.keySet,
      "the refreshed partition must actually have been rewritten")
    // and the re-read view still equals the full aggregate
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("s_name"), col("n_name"), col("total_amount"), col("n_items"))
        .orderBy(col("s_name")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(key(spark.read.parquet(path)) == key(agg))
  }

  test("mergeSchema reads a layout whose files span schema versions") {
    import spark.implicits._
    val path = tmpDir("evolve")
    // v1 files land without the tax column; v2 files add it
    Seq((1L, 10.0)).toDF("k", "qty").write.parquet(s"$path/part=a")
    Seq((2L, 20.0, 0.05)).toDF("k", "qty", "tax").write.parquet(s"$path/part=b")
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
      .select(col("k"), col("qty"), col("tax")).orderBy(col("k")).collect()
    assert(merged.length == 2)
    assert(merged(0).isNullAt(2), "v1 rows must null-fill the added column")
    assert(merged(1).getDouble(2) == 0.05)
  }

  private def parquetFilesPerDir(p: String): Map[String, Int] = {
    def walk(f: java.io.File): Seq[String] =
      if (f.isDirectory) Option(f.listFiles()).map(_.toSeq.flatMap(walk)).getOrElse(Seq.empty)
      else if (f.getName.endsWith(".parquet")) Seq(f.getParent) else Seq.empty
    walk(new java.io.File(p)).groupBy(identity).map { case (d, fs) => d -> fs.size }
  }

  test("compaction collapses small ingest files without changing the data") {
    val rows = (0 until 3000).map(i => OrderRec(i.toLong, i.toLong % 50, s"P${i % 5}", i * 2.0))
    val out = tmpDir("compact")
    // small batches → many flushes → many small files per partition
    // (compact=false shows the raw append pattern the sink would
    // otherwise accumulate)
    IngestOps.runIngest(spark, new FixtureSource(rows, pageSize = 100), out,
      batchSize = 200, compact = false)
    def parquetFiles(p: String): Int = parquetFilesPerDir(p).values.sum
    val before = parquetFiles(out)
    assert(before > 10, s"expected many small files from batched appends, got $before")
    val compacted = WriteOps.compact(spark, out)
    assert(parquetFiles(compacted) < before / 2,
      "compaction must materially reduce the file count")
    val a = spark.read.parquet(out)
    val b = spark.read.parquet(compacted)
    assert(b.count() == a.count())
    assert(b.agg(sum(col("o_orderkey"))).head.getLong(0) ==
           a.agg(sum(col("o_orderkey"))).head.getLong(0))
  }

  test("batch sink lands ≤ ⌈bytes/target⌉ files per partition dir (compaction wired in)") {
    val rows = (0 until 3000).map(i => OrderRec(i.toLong, i.toLong % 50, s"P${i % 5}", i * 2.0))
    val out = tmpDir("compact_wired")
    // 15 flushes; the wired-in maintenance pass must collapse the
    // per-flush files so every partition directory holds at most
    // max(1, ceil(dirBytes / target)) data files — here 1, the target
    // dwarfs the fixture
    val n = IngestOps.runIngest(spark, new FixtureSource(rows, pageSize = 100), out,
      batchSize = 200)
    assert(n == 3000)
    val perDir = parquetFilesPerDir(out)
    assert(perDir.nonEmpty)
    perDir.foreach { case (dir, count) =>
      val dirBytes = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".parquet")).map(_.length()).sum
      val bound = math.max(1, math.ceil(dirBytes.toDouble / (128L * 1024 * 1024)).toInt)
      assert(count <= bound, s"$dir has $count files, bound $bound")
    }
    val landed = spark.read.parquet(out)
    assert(landed.count() == 3000)
    assert(landed.agg(sum(col("o_orderkey"))).head.getLong(0) ==
           rows.map(_.o_orderkey).sum)
  }

  test("in-place compaction round-trips numeric-looking string partition values verbatim") {
    import spark.implicits._
    val base = tmpDir("compact_vals")
    val df = Seq((1L, "00123"), (2L, "00123"), (3L, "7"), (4L, "007")).toDF("id", "key")
    df.write.mode("overwrite").partitionBy("key").parquet(base)
    df.write.mode("append").partitionBy("key").parquet(base)
    WriteOps.compactPartitionedInPlace(spark, base, Seq("key"))
    // with partition-value type inference, "00123" would be rewritten
    // to key=123 — a different directory and a different value
    val dirs = new java.io.File(base).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("key=00123", "key=7", "key=007"),
      s"partition directory names must round-trip verbatim: $dirs")
    assert(spark.read.parquet(base).count() == 8)
    // no leftover swap directories
    assert(!new java.io.File(base + "_old").exists())
    assert(!new java.io.File(base + "_compacting").exists())
  }

  test("quarantine read salvages every good row and captures every garbage line verbatim") {
    val rows = (0 until 1200).map(i =>
      OrderRec(i.toLong, i.toLong % 100, s"P${i % 5}", i * 1.5))
    val base = tmpDir("quarantine")
    IngestOps.stagePages(new FixtureSource(rows, pageSize = 300), s"$base/landing")
    val nBad = IngestOps.injectGarbage(s"$base/landing")
    assert(nBad == IngestOps.GarbageLines.size)
    // idempotent: a second injection on the same zone adds nothing
    assert(IngestOps.injectGarbage(s"$base/landing") == nBad)
    val (clean, quarantined) = IngestOps.readWithQuarantine(
      spark, s"$base/landing", s"$base/out", s"$base/quarantine")
    assert(quarantined == nBad.toLong,
      s"expected exactly $nBad quarantined lines, got $quarantined")
    assert(clean.count() == 1200, "no good row may be lost from the dirty page")
    assert(clean.agg(sum(col("o_orderkey"))).head.getLong(0) ==
      rows.map(_.o_orderkey).sum, "good rows round-trip exactly")
    // the quarantine preserves the raw lines for triage/replay
    val lines = spark.read.parquet(s"$base/quarantine")
      .collect().map(_.getString(0)).toSet
    assert(lines == IngestOps.GarbageLines.toSet,
      s"quarantine must carry the malformed lines verbatim: $lines")
  }

  test("geo lookup is deterministic and in valid ranges") {
    val names = Seq("UNITED STATES", "FRANCE", "a")
    names.foreach { n =>
      val (lat, lon) = GeoOps.lookup(n)
      assert(GeoOps.lookup(n) == ((lat, lon)))
      assert(lat >= -90 && lat <= 90 && lon >= -180 && lon <= 180)
    }
  }

  test("rate-limited client spaces lookups by the floor interval") {
    val client = new GeoOps.RateLimitedClient(minIntervalMs = 20)
    val t0 = System.nanoTime()
    (1 to 4).foreach(_ => client.geocode("X"))
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    // 3 spaced intervals ≈ 60ms; allow for millisecond-clock
    // truncation on the sleep boundaries (observed 59ms flake)
    assert(elapsedMs >= 55, s"4 lookups at 20ms floor took only ${elapsedMs}ms")
  }

  test("geo-enriched rollup matches the plain join rollup on totals") {
    val li = Tables.lineitem(spark, sf)
    val su = Tables.supplier(spark, sf)
    val na = Tables.nation(spark, sf)
    val enriched = GeoOps.geoEnrichedRollup(li, su, na)
      .select(col("n_name"), col("total_amount"), col("n_items"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val plain = RelationalOps.geoRollup(li, su, na)
      .groupBy(col("n_name"))
      .agg(sum(col("total_amount")).as("t"), sum(col("n_items")).as("n"))
      .orderBy(col("n_name"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(enriched.sortBy(_._1) == plain.sortBy(_._1),
      "enrichment must not change the aggregate, only add coordinates")
  }

  test("training shards: bounded files, per-shard ranges, manifest matches layout") {
    import spark.implicits._
    // 2 langs × 20 docs × 100 tokens at seqLen=64 → ~32 sequences per
    // stream → 4+ shards at seqsPerShard=8; maxRecordsPerFile=10
    // forces the writer to roll files inside at least one shard
    val docs = (for {
      (lang, base) <- Seq(("en", 0L), ("fr", 1000L)); i <- 1 to 20
    } yield (base + i, ("tok " * 100).trim, lang, "s"))
      .toDF("doc_id", "text", "lang", "source")
    val out = tmpDir("shards")
    val manifest = CorpusOps.writeTrainingShards(docs, out, seqLen = 64,
      seqsPerShard = 8L, maxRecordsPerFile = 10L).collect()
    assert(manifest.length >= 8, s"expected >=4 shards per lang, got ${manifest.length}")
    // every individual data FILE respects the record bound (the
    // loader-friendliness contract maxRecordsPerFile enforces)
    def dataFiles(d: java.io.File): Seq[java.io.File] =
      d.listFiles.toSeq.flatMap {
        case f if f.isDirectory => dataFiles(f)
        case f if f.getName.endsWith(".parquet") => Seq(f)
        case _ => Seq.empty
      }
    val files = dataFiles(new java.io.File(out))
    assert(files.nonEmpty)
    files.foreach { f =>
      val n = spark.read.parquet(f.getPath).count()
      assert(n <= 10L, s"file ${f.getName} holds $n rows > maxRecordsPerFile")
    }
    // a shard directory holds ONLY its own sequence range
    for {
      langDir <- new java.io.File(out).listFiles.toSeq.filter(d => d.isDirectory && d.getName.startsWith("lang="))
      shardDir <- langDir.listFiles.toSeq.filter(d => d.isDirectory && d.getName.startsWith("shard_id="))
    } {
      val sid = shardDir.getName.stripPrefix("shard_id=").toLong
      val seqs = spark.read.parquet(shardDir.getPath)
        .select(col("seq_id")).as[Long].collect()
      assert(seqs.nonEmpty && seqs.forall(_ / 8 == sid),
        s"${shardDir.getName} holds sequences outside its range")
    }
    // the emitted shard manifest equals an independent recompute from
    // the sequence manifest — nothing lost or duplicated by the write
    val expect = CorpusOps.sequenceManifest(docs, 64)
      .withColumn("shard_id", expr("seq_id DIV 8"))
      .groupBy(col("lang"), col("shard_id"))
      .agg(min(col("seq_id")).as("first_seq"), max(col("seq_id")).as("last_seq"),
           count_distinct(col("seq_id")).as("n_seqs"), count(lit(1)).as("n_rows"),
           sum(col("n_from_doc")).as("n_tokens"))
      .orderBy(col("lang"), col("shard_id")).collect()
    assert(manifest.map(_.toSeq).toSeq == expect.map(_.toSeq).toSeq)
  }

  test("dashboard second-stage rollups conserve the top-30 slice total") {
    val o = Tables.orders(spark, sf)
    val slice = RelationalOps.topMonthSlice(o)
      .agg(sum(col("total_price"))).head.getDouble(0)
    val byAgency = RelationalOps.dashSubAgencyRollup(o)
      .agg(sum(col("total_price"))).head.getDouble(0)
    val byMonth = RelationalOps.dashMonthRollup(o)
      .agg(sum(col("total_price"))).head.getDouble(0)
    assert(math.abs(slice - byAgency) < 1e-6)
    assert(math.abs(slice - byMonth) < 1e-6)
  }
}
