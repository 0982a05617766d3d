package graft
import org.apache.spark.sql.SparkSession
/** Dev utility: (re)generate the ScaleFixture only. */
object RegenFixture {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/target/scale/sf1")
    val spark = SparkSession.builder()
      .config("spark.local.dir", LocalDirs.dir).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleFixture.ensure(spark, base, out, 10)
    spark.stop()
    println("fixture ready at " + out)
  }
}
