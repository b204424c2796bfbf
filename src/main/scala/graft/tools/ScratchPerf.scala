package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.engine.Tables

/** Throwaway bisection harness for optimization-round experiments.
  * Not part of the driver contract; edited freely per experiment.
  *
  * Usage: ScratchPerf [nWarm] query...
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  *      SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2" applied on top of the
  *      bench session shape — for config A/B runs.
  */
object ScratchPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nWarm = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    val names = (if (args.headOption.exists(_.toIntOption.isDefined)) args.drop(1)
                 else args).toSeq
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        graft.engine.Scratch.dir(
        s"${System.getProperty("java.io.tmpdir")}/graft_wh_${ProcessHandle.current().pid()}"))
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach { s =>
      s.split(";").filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        b = b.config(k, v)
      }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach { t =>
      try Tables.load(spark, sfDir, t).count() catch { case _: Throwable => }
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (0 to nWarm).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SCRATCH $name%-36s min=${ts.drop(1).min}%7.3f all=" +
        ts.map(t => f"$t%.2f").mkString(","))
    }
    spark.stop()
  }
}
