package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV ingestion — the reference's only fully-coded pipeline
  * (`/root/reference/job1-DDL_Load_Data_Spark_Iceberg.py:33-88`):
  * header'd CSV → schema inference → alias → validation.
  *
  * Differences from the reference, on purpose:
  *  - validation uses `Dataset.isEmpty` (limit-1 job), not the reference's
  *    `df.rdd.isEmpty()` (`job1:83`) which forces a full plan→RDD
  *    conversion — an anti-pattern at any scale;
  *  - `inferSchema` is exposed but discouraged for production ingest: it
  *    runs an extra full scan of the file before the real read (fine for
  *    a bootstrap load, wrong for a 100 TB recurring job — pass an
  *    explicit schema instead);
  *  - validation returns a typed report instead of log-and-exit
  *    (`job1:114,177`), so callers decide the failure policy.
  */
object Ingest {

  final case class ValidationReport(
      alias: String,
      isEmpty: Boolean,
      missingColumns: Seq[String]) {
    def ok: Boolean = !isEmpty && missingColumns.isEmpty
  }

  /** `job1:50-56` equivalent: header CSV with optional inference. */
  def loadCsv(spark: SparkSession, path: String, alias: String,
              inferSchema: Boolean = true,
              schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val reader = spark.read.option("header", "true")
    val withSchema = schema match {
      case Some(sc) => reader.schema(sc)
      case None => reader.option("inferSchema", inferSchema.toString)
    }
    withSchema.csv(path).alias(alias)
  }

  /** `job1:69-88` equivalent: non-empty + expected-columns check. */
  def validate(df: DataFrame, alias: String,
               expectedColumns: Seq[String] = Seq.empty): ValidationReport =
    ValidationReport(
      alias,
      isEmpty = df.isEmpty,
      missingColumns = expectedColumns.filterNot(df.columns.contains))

  /** Quarantine ingestion (the dead-letter shape the reference's
    * log-and-exit validation can't express): PERMISSIVE JSON read with a
    * corrupt-record column splits the input into (clean rows, quarantined
    * raw lines) in ONE pass — a recurring 100 TB load can't abort on the
    * first bad record (FAILFAST) and must not silently null it out
    * either; it lands the typed rows and files the raw rejects for
    * replay. Caveat encoded here: Spark requires the corrupt column
    * cached/materialized before it can be filtered on (a known
    * restriction), hence the cache(). */
  def loadJsonWithQuarantine(spark: SparkSession, path: String,
                             schema: org.apache.spark.sql.types.StructType)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val corruptCol = "_corrupt_record"
    val full = schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    val raw = spark.read
      .schema(full)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      .cache()
    val clean = raw.filter(col(corruptCol).isNull)
      .drop(corruptCol)
    val quarantined = raw.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))
    (clean, quarantined)
  }
}
