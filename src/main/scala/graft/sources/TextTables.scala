package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Text/CSV/JSON source-sink layer — the reference genre's I/O surface
  * (TextInputFormat lines parsed in the mapper; FileOutputFormat
  * `part-r-*` text shards) re-expressed Spark-first (SURVEY §2.1).
  *
  * Schema-on-read happens declaratively: the delimited line is split in a
  * projection with explicit casts against the pinned table schema, instead
  * of imperative parsing in a Mapper. Writes shard exactly like the MR
  * genre (one part file per partition) because that IS Spark's layout.
  */
object TextTables {

  /** Write any flat table as tab-separated text shards. */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.select(concat_ws("\t", df.columns.map(col).toIndexedSeq: _*)
        .as("value"))
      .write.mode("overwrite").text(path)

  /** Read tab-separated text back against a pinned schema — the mapper's
    * split-and-parse as a single codegen'd projection. */
  def readTsv(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val raw = spark.read.text(path)
      .select(split(col("value"), "\t").as("f"))
    val cols = schema.fields.zipWithIndex.map { case (f, i) =>
      col("f").getItem(i).cast(f.dataType).as(f.name)
    }
    raw.select(cols.toIndexedSeq: _*)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
