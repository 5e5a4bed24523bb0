package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** S3 — JSON envelope unwrap + nested-object flattening.
  *
  * The reference does `resp.json()["data"]` then `pd.json_normalize`
  * (mabna_tables_create.py:56-58): nested objects become dotted flat
  * columns (`instrument.id`, `meta.version`), arrays-of-structs pass
  * through as values. Re-expressed: `spark.read.json` infers the nested
  * StructType; `flatten` recursively projects struct leaves into flat
  * columns in one `select` (pure plan rewrite — no row processing, no
  * Python loop; whole-stage codegen sees only the final projection).
  */
object JsonFlatten {

  /** Recursively flatten all struct columns. Arrays and scalars pass
    * through. `sep` "." reproduces the reference's dotted names (needs
    * backtick-quoting downstream); "_" is the engine-friendly default. */
  def flatten(df: DataFrame, sep: String = "_"): DataFrame = {
    // top level: col(name) directly; nested: getField chain
    def top(schema: StructType): Seq[Column] =
      schema.fields.toSeq.flatMap { f =>
        f.dataType match {
          case st: StructType =>
            flattenStruct(st, df(s"`${f.name}`"), f.name)
          case _ => Seq(df(s"`${f.name}`"))
        }
      }
    def flattenStruct(st: StructType, base: Column, prefix: String): Seq[Column] =
      st.fields.toSeq.flatMap { f =>
        val name = s"$prefix$sep${f.name}"
        f.dataType match {
          case inner: StructType => flattenStruct(inner, base.getField(f.name), name)
          case _ => Seq(base.getField(f.name).as(name))
        }
      }
    df.select(top(df.schema): _*)
  }

  /** Unwrap the `{"data": [ ...records... ]}` API envelope into one row
    * per record (schema inferred), then flatten nested objects. */
  def parseEnvelope(spark: SparkSession, raw: Dataset[String], sep: String = "_"): DataFrame = {
    val parsed = spark.read.json(raw)
    parsed.schema.find(_.name == "data").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.ArrayType(_: StructType, _)) =>
        val records = parsed.select(explode(col("data")).as("rec")).select("rec.*")
        flatten(records, sep)
      case _ => // empty `data` (or absent): no records, schema unknowable
        spark.emptyDataFrame
    }
  }

  /** X3 — first-element-of-array struct-field extract: the reference's
    * Python row loop over `assets.categories[0]['id']`
    * (mabna_tables_create.py:113-117) as a single expression. */
  def firstElementField(arr: Column, field: String): Column =
    try_element_at(arr, lit(1)).getField(field)
}
