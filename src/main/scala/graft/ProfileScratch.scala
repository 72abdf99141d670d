package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

// Scratch profiler / semantics probe (not part of the deliverable
// surface; driven manually while optimizing).
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", DoubleType),
      StructField("_corrupt", StringType)))
    val rows = Seq(
      """{"a":"x","b":1.5}""",          // clean
      """{"a":"x","b":"oops"}""",       // valid JSON, uncastable field
      """{"a":"x","b":}""",             // malformed JSON
      """not json at all""",            // garbage
      """{"a":null}""",                 // valid, missing field
      """[]""",                         // valid JSON, not an object
      """null"""                        // JSON null literal
    ).toDF("json_str")
    val out = rows.select(
      col("json_str"),
      from_json(col("json_str"), schema,
        Map("columnNameOfCorruptRecord" -> "_corrupt")).as("data"),
      try_parse_json(col("json_str")).isNotNull.as("tpj_ok"))
      .select(col("json_str"), col("data.a"), col("data.b"),
        col("data._corrupt").isNull.as("corrupt_ok"), col("tpj_ok"))
    out.show(false)
    spark.stop()
  }
}
