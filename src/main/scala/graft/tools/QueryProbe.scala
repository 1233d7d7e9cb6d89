package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query timing probe: runs the named SparkEntry queries at the
  * given sfDir under the Bench session config (local[32], AQE, 32
  * shuffle partitions) and prints per-run wall times — the tool for
  * confirming a targeted plan change moved the one query it aimed at
  * without waiting on the full suite.
  * Usage: runMain graft.tools.QueryProbe <sfDir> <query>... [--n=5] [--cold]
  * `--cold` skips the untimed warmup run, so run 1 bills the one-time
  * codegen/broadcast/planning cost the per-round bench sees.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val n = args.collectFirst { case s if s.startsWith("--n=") => s.drop(4).toInt }.getOrElse(5)
    val cold = args.contains("--cold")
    val rest = args.filterNot(_.startsWith("--"))
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.1")
    val names = rest.tail.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // opt-in conf overrides for A/B probes: --conf=key=value
    args.filter(_.startsWith("--conf=")).foreach { s =>
      val kv = s.drop(7).split("=", 2)
      require(kv.length == 2 && kv(0).nonEmpty,
        s"malformed --conf '$s' — expected --conf=key=value")
      spark.conf.set(kv(0), kv(1))
    }
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // warm parquet footers
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"[qprobe] $name: no such query")
        case Some(fn) =>
          if (!cold) fn(spark, sfDir).count() // warmup: codegen/broadcast paths
          val ts = (1 to n).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            val dt = (System.nanoTime() - t0) / 1e9
            spark.catalog.clearCache(); System.gc() // between runs, outside the timer
            dt
          }
          println(f"[qprobe] $name%-24s min=${ts.min}%6.3f med=${ts.sorted.apply(n / 2)}%6.3f runs=" +
            ts.map(t => f"$t%.3f").mkString(","))
      }
    }
    spark.stop()
  }
}
