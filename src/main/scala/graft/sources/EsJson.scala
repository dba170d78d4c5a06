package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Elasticsearch search-response JSON source (SURVEY.md §2.1 #1/#3).
  *
  * The reference detects the `{hits: {hits: [{_source: …}]}}` envelope and
  * keeps only `_source` payloads, discarding all ES metadata
  * [`ElasticSearch ETL.py:157-163`]; bare documents pass through as-is.
  *
  * Live-cluster pagination (`search_after` loop, [`ETL.py:220-267`]) is a
  * connector concern out of scope offline (SURVEY.md §7.5); exported
  * response files are the modeled input. One exploded row per hit — at
  * scale, responses across many files parallelize by file split, and the
  * explode is narrow (no shuffle).
  */
object EsJson {

  /** True if the inferred schema carries the ES response envelope. */
  def isEnvelope(schema: StructType): Boolean =
    schema.fields.find(_.name == "hits").map(_.dataType).exists {
      case s: StructType =>
        s.fields.find(_.name == "hits").map(_.dataType).exists {
          case ArrayType(h: StructType, _) => h.fieldNames.contains("_source")
          case _ => false
        }
      case _ => false
    }

  /** Unwrap an envelope DataFrame to one row per `_source` document. */
  def unwrap(df: DataFrame): DataFrame =
    if (isEnvelope(df.schema))
      df.select(explode(col("hits.hits")).as("hit")).select("hit._source.*")
    else df

  /** Name of the per-vintage schema sidecar an export directory may
    * carry: the PARSE schema (pre-unwrap, post-[[graft.flatten.EmptyShapes]]
    * graft) as Spark schema JSON. Underscore-prefixed, so the JSON
    * datasource never reads it as data.
    */
  val SchemaSidecar = "_schema.json"

  /** Persist `parseSchema` as the vintage sidecar of `dir` (side name +
    * atomic rename, the manifest-commit discipline). An exported vintage
    * is immutable once written, so its grafted schema can be discovered
    * ONCE at export time; every later read of the vintage then skips
    * both the inference scan and the EmptyShapes discovery pass — zero
    * Spark jobs before the parse itself.
    */
  def writeSchemaSidecar(spark: SparkSession, dir: String,
      parseSchema: StructType): Unit = {
    import org.apache.hadoop.fs.Path
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val side = new Path(base, SchemaSidecar + ".writing")
    val out = fs.create(side, true)
    try out.write(parseSchema.json.getBytes("UTF-8")) finally out.close()
    val dst = new Path(base, SchemaSidecar)
    fs.delete(dst, false)
    require(fs.rename(side, dst),
      s"writeSchemaSidecar: commit $side -> $dst failed")
  }

  /** The vintage's persisted parse schema, when `path` is a directory
    * carrying one. A CORRUPT sidecar fails loudly — silently falling
    * back to inference could give a different schema than every other
    * reader of the vintage saw.
    */
  def readSchemaSidecar(spark: SparkSession,
      path: String): Option[StructType] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path, SchemaSidecar)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) || !fs.getFileStatus(p).isFile) None
    else {
      val in = fs.open(p)
      val text =
        try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
      Some(DataType.fromJson(text).asInstanceOf[StructType])
    }
  }

  /** Read one-or-many exported ES response files (or bare document files)
    * as one row per document. `multiLine` because exported responses are
    * pretty-printed single documents, not JSONL.
    *
    * If the path is a vintage directory carrying a [[SchemaSidecar]],
    * the persisted parse schema is used directly — no inference scan, no
    * EmptyShapes discovery, no Spark job until the parse itself.
    */
  def read(spark: SparkSession, path: String,
      multiLine: Boolean = true): DataFrame =
    readSchemaSidecar(spark, path) match {
      case Some(ps) =>
        unwrap(spark.read.option("multiLine", multiLine)
          .schema(ps).json(path))
      case None => readFiles(spark, Seq(path), multiLine)
    }

  /** Multi-path variant of [[read]] — the bounded schema-inference
    * prefix of the es-export connector reads an explicit file list.
    *
    * Inference is AUGMENTED with [[graft.flatten.EmptyShapes]]: keys
    * whose value is an empty object in every document are dropped by
    * Spark's schema inference, which would silently erase them from
    * JSON-rendered subtree cells where the reference's json.dumps
    * keeps them. The shape pass reuses the same bounded file list as
    * inference; when nothing was dropped (the common case) the
    * re-read is skipped entirely.
    */
  def readFiles(spark: SparkSession, paths: Seq[String],
      multiLine: Boolean = true): DataFrame = {
    def rd = spark.read
      .option("multiLine", multiLine)
      // ISO-8601-looking strings must stay strings — the reference never
      // parses dates (SURVEY.md §1.2); be explicit even though these
      // default to false.
      .option("inferTimestamp", false)
      .option("inferDate", false)
      .option("prefersDecimal", false)
    val inferred = rd.json(paths: _*)
    val schema = graft.flatten.EmptyShapes.augment(spark,
      inferred.schema, paths, wholeFile = multiLine)
    unwrap(if (schema eq inferred.schema) inferred
           else rd.schema(schema).json(paths: _*))
  }

  /** The PARSE schema a vintage sidecar persists: inference +
    * [[graft.flatten.EmptyShapes]] graft over the same paths — exactly
    * what [[readFiles]] derives on every read, computed once so
    * [[writeSchemaSidecar]] can pin it to the vintage.
    */
  def inferParseSchema(spark: SparkSession, paths: Seq[String],
      multiLine: Boolean = true): StructType = {
    val inferred = spark.read
      .option("multiLine", multiLine)
      .option("inferTimestamp", false)
      .option("inferDate", false)
      .option("prefersDecimal", false)
      .json(paths: _*).schema
    graft.flatten.EmptyShapes.augment(spark, inferred, paths,
      wholeFile = multiLine)
  }

  /** Schema-reuse read: parse with a KNOWN schema, skipping the inference
    * scan entirely. JSON inference is a full extra pass over the input —
    * the dominant cost of a cold flatten (BENCH r01: ~17.5 s/1k docs cold
    * vs sub-second warm). Batches of exported pages share one layout, so
    * infer once (`read(...).schema`), then feed that schema to every
    * subsequent batch.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      multiLine: Boolean): DataFrame =
    unwrap(spark.read
      .option("multiLine", multiLine)
      .schema(schema)
      .json(path))
}
