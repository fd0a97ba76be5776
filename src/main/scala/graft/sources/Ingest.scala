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
}
