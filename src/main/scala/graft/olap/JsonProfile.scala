package graft.olap

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P28: recursive JSON flatten + per-row null profiling — the reference's
  * only procedural data-logic (`duckdb_olap.ipynb` cell 16: flatten nested
  * dicts to `a.b.0.c` keys, count null/empty/"null" leaves, % per row).
  *
  * This is the one genuinely UDF-shaped operator in the inventory: the
  * key set is data-dependent, so no static schema or higher-order function
  * can express the recursion. The UDF parses with Jackson (already on
  * Spark's classpath) once per row and returns the flattened map — the
  * null-ratio arithmetic stays in codegen'd column expressions on top.
  *
  * Scale: a narrow per-row map; no shuffle, no state. The JSON parse cost
  * is the same class as the from_json the pipeline already pays.
  */
object JsonProfile {

  /** Flatten nested JSON to dotted-path keys (`a.b.0.c`), stringifying
    * leaves; null leaves become Scala null in the map. */
  private def flatten(node: com.fasterxml.jackson.databind.JsonNode,
                      prefix: String,
                      out: mutable.LinkedHashMap[String, String]): Unit = {
    import scala.jdk.CollectionConverters._
    if (node.isObject) {
      node.fields().asScala.foreach { e =>
        val key = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
        flatten(e.getValue, key, out)
      }
    } else if (node.isArray) {
      node.elements().asScala.zipWithIndex.foreach { case (v, i) =>
        val key = if (prefix.isEmpty) i.toString else s"$prefix.$i"
        flatten(v, key, out)
      }
    } else if (node.isNull) out += (prefix -> null)
    else out += (prefix -> node.asText())
  }

  /** Shared mapper: construction builds Jackson's serializer caches and is
    * far more expensive than a parse; `readTree` on a shared instance is
    * thread-safe. One per executor JVM, not one per row. */
  @transient private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** UDF: JSON string → flattened map<string,string> (null on parse failure). */
  val flattenJson: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (json: String) =>
      if (json == null) null
      else try {
        val out = mutable.LinkedHashMap.empty[String, String]
        flatten(mapper.readTree(json), "", out)
        out.toMap
      } catch { case _: Exception => null }
    }

  /** A leaf counts as "null-ish" when absent, empty, or the literal
    * "null"/"none" (reference cell 16 semantics). */
  def nullishCount(flatCol: Column): Column =
    size(filter(map_values(flatCol),
      v => v.isNull || trim(v) === "" || lower(v).isin("null", "none")))

  /** Per-row profile: total leaves, null-ish leaves, null % (0 leaves → 100%,
    * matching the reference's treatment of unparseable rows as fully bad). */
  def profile(df: DataFrame, jsonCol: String, idCol: String): DataFrame = {
    val flat = flattenJson(col(jsonCol))
    df.select(col(idCol), flat.as("flat"))
      .select(
        col(idCol),
        coalesce(size(map_keys(col("flat"))), lit(0)).cast("long").as("n_fields"),
        coalesce(nullishCount(col("flat")), lit(0)).cast("long").as("n_nullish"))
      .withColumn("null_pct",
        when(col("n_fields") === 0, lit(100.0))
          .otherwise(col("n_nullish") * lit(100.0) / col("n_fields")))
  }
}
