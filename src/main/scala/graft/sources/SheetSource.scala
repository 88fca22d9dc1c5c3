package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Preamble-skipping CSV source.
  *
  * The reference reads ASCT+B Google-Sheet exports with
  * `pd.read_csv(url, skiprows=10)` (`asctb_data_wrangling.py:92`) —
  * row 11 is the header. Spark's CSV reader has no skip-rows option,
  * so we read lines, drop the first N by file position, and hand the
  * remainder back to the CSV parser (schema inference + quoted-field
  * handling stay with the battle-tested parser; we only do line
  * accounting).
  *
  * Scale note: preamble skipping is inherently ordered and applies to
  * config-sized sheet files (thousands of rows), never to the bulk
  * data path — bulk tables enter as Parquet. `zipWithIndex` costs one
  * extra pass over this small file and nothing else.
  */
object SheetSource {

  def csvSkipRows(spark: SparkSession, path: String, skipRows: Int = 10,
                  header: Boolean = true, inferSchema: Boolean = false): DataFrame = {
    import spark.implicits._
    val lines: Dataset[String] = spark.read.textFile(path)
    val kept = lines.rdd.zipWithIndex()
      .filter { case (_, idx) => idx >= skipRows }
      .map(_._1)
    spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(spark.createDataset(kept))
  }
}
