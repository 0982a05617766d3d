package graft
import org.apache.spark.sql.SparkSession
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.local.dir", LocalDirs.dir).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, args.head).explain("formatted")
    }
    spark.stop()
  }
}
