package graft.tools
import org.apache.spark.sql.SparkSession
object AnsiCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("[ansi] enabled=" + spark.conf.get("spark.sql.ansi.enabled"))
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val r = scala.util.Try(
      Seq("x").toDF("k").select(element_at(typedLit(Map("a" -> "1")), col("k"))).collect()
    )
    println("[ansi] map-missing-key => " + (if (r.isSuccess) "null-ok " + r.get.head else "THROWS " + r.failed.get.getClass.getSimpleName))
    val r2 = scala.util.Try(
      Seq(Seq("a")).toDF("arr").select(element_at(col("arr"), lit(5))).collect()
    )
    println("[ansi] array-oob => " + (if (r2.isSuccess) "null-ok" else "THROWS " + r2.failed.get.getClass.getSimpleName))
    spark.stop()
  }
}
