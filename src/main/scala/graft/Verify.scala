package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Reference semantics are PySpark 3.4 non-ANSI: bad casts -> null
      // (reference: app/ml_app.py:479-485); Spark 4 defaults ANSI on.
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet stores TIMESTAMP(NANOS); see Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // bucketed/catalog tables land in a run-unique tmp warehouse,
      // never in the working directory
      .config("spark.sql.warehouse.dir",
        graft.engine.Scratch.dir(
        s"${System.getProperty("java.io.tmpdir")}/graft_wh_${ProcessHandle.current().pid()}"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev-loop filter: SPARK_GRAFT_ONLY=q50,q67 runs just the named
    // queries (prefix match). Unset → full run (the driver's mode).
    val only: Option[Seq[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSeq)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith)) }
    selected.foreach { case (name, fn) =>
      def attempt(): Unit =
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      // one logged retry: a transient local-fs hiccup must not zero a
      // correctness row for the whole round (observed once in ~15
      // runs); a real failure still fails — twice, loudly
      try attempt()
      catch {
        case e1: Throwable =>
          System.err.println(s"[verify] $name failed once (${e1.getMessage}); retrying")
          try attempt()
          catch { case e2: Throwable =>
            System.err.println(s"[verify] $name failed: ${e2.getMessage}")
          }
      }
    }
    // The q67/q121 oracles replay probe + list stats from the
    // PERSISTED index state: export (vec_id, list_id) + centroids as
    // plain parquet at the stable path the oracle SQL embeds — the
    // tmp warehouse holding the catalog tables dies with this JVM,
    // the dump must not. (ivfIndexFor memo ⇒ zero extra quantizer
    // fits after either query ran.)
    if (selected.contains("q67_ivf_topk") || selected.contains("q121_ivf_list_stats") ||
        selected.contains("q212_index_coverage") || selected.contains("q221_ivf_purity") ||
        selected.contains("q235_ivf_incremental") ||
        selected.contains("q246_semantic_probe"))
      graft.engine.SimilarityOps.dumpIvfOracle(
        graft.engine.Tables.embeddings(spark, sfDir), tag = sfDir)
    // Same contract for the PQ codebook: the q241/q242 oracles replay
    // encode + ADC from the exported sub-centroid table.
    if (selected.contains("q241_pq_codes") || selected.contains("q242_pq_adc_recall") ||
        selected.contains("q244_pq_drift"))
      graft.engine.SimilarityOps.dumpPqOracle(
        graft.engine.Tables.embeddings(spark, sfDir), tag = sfDir)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    graft.queries.MLShared.release()
    graft.queries.SketchShared.release()
    graft.queries.RetrievalShared.release()
    graft.queries.BpeShared.release()
    graft.engine.SimilarityOps.release()
    graft.engine.DedupOps.release()
    graft.engine.TextOps.release()
    spark.stop()
  }
}
