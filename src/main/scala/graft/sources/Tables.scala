package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink helpers. The reference has no I/O layer of its own (pandas
  * constructors only — SURVEY §2.5); this is the engine's equivalent
  * surface for the driver's parquet tables plus general formats, written so
  * scans stay prunable/filterable and sinks are partition-aware.
  */
object Tables {

  /** Read one of the driver's test tables. `events.ts` arrives as parquet
    * TIMESTAMP(NANOS), which Spark's default schema converter rejects;
    * reading with an explicit schema (ts as raw long nanos) avoids the
    * legacy `nanosAsLong` session conf — no session state is mutated —
    * then ts is normalized to a microsecond timestamp via integer division
    * (double math would corrupt epochs above 2⁵³ ns).
    */
  def testTable(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      import org.apache.spark.sql.types._
      val sch = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      spark.read.schema(sch).parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Generic format read (parquet/orc/json/csv); csv/json get schema
    * inference + header handling. Filters/projections compose lazily on the
    * result and push into the scan where the format supports it. */
  def read(spark: SparkSession, path: String, format: String = "parquet"): DataFrame =
    format match {
      case "csv"  => spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      case "json" => spark.read.json(path)
      case f      => spark.read.format(f).load(path)
    }

  /** Partition-aware sink: directory-partitions by `partitionBy` (enables
    * partition pruning for downstream readers) and targets `maxRecords` per
    * file so a 1000-executor write neither produces millions of tiny files
    * nor multi-GB ones. */
  def write(
      df: DataFrame,
      path: String,
      format: String = "parquet",
      partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val writer = df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .format(format)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer).save(path)
  }

  /** Bucketed sink: hash-buckets (and sorts) by the join/group key into a
    * catalog table. The 100 TB payoff is co-located joins and aggregations —
    * two tables bucketed on the same key by the same count join with NO
    * exchange on either side (Spark trusts the on-disk bucketing), so a
    * fact⋈fact join that would shuffle both corpora becomes a per-bucket
    * local merge. Requires `saveAsTable` (bucket metadata lives in the
    * catalog, not the parquet files). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      format: String = "parquet",
      statsCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed requires at least one bucket column")
    df.write.mode("overwrite")
      .format(format)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
    // Planner fuel: file listings give a catalog parquet table a real
    // sizeInBytes even unanalyzed, but DERIVED sizes don't exist without
    // statistics — a filtered dim keeps its full-scan estimate, so a
    // selective `dim WHERE …` sort-merges where it should broadcast, and
    // join reorder has no row counts to work with. One ANALYZE pass
    // records rowCount plus per-column NDV/min/max/null-count for the
    // bucket (join) keys and any `statsCols`, so broadcast-vs-sortmerge
    // and CBO selectivity ride on real numbers at PLAN time — before AQE
    // ever sees a runtime stat. At 100 TB this is one extra scan per
    // table build, amortized over every downstream join.
    val cols = (bucketCols ++ statsCols).distinct
    // backtick PART-wise: quoting "db.tbl" whole would resolve as a
    // single dotted identifier in the default database
    val qualified = table.split('.').map(p => s"`$p`").mkString(".")
    df.sparkSession.sql(s"ANALYZE TABLE $qualified COMPUTE STATISTICS " +
      s"FOR COLUMNS ${cols.map(c => s"`$c`").mkString(", ")}")
  }

  /** Training-data shard export: every row lands in a DETERMINISTIC shard
    * (`pmod(xxhash64(idCols), nShards)` — stable across runs, partitionings,
    * and cluster sizes, unlike `repartition`'s round-robin), written as one
    * directory partition per shard, sorted within each shard by `sortCols`
    * (typically token count, so fixed-capacity packing reads near-uniform
    * sequences). Exactly one file per shard at any scale: the repartition
    * shuffles each shard to one task — size shards via `nShards`, not file
    * splits, which is the training-loader contract (shard count = loader
    * parallelism). Returns the shard column name for downstream joins.
    *
    * No ANALYZE here by design: shards are a path export with no catalog
    * entry, and path reads already plan on real file-listing sizes;
    * register the path as a table (and ANALYZE it) only if shards feed
    * further joins — [[writeBucketed]] is the stats-carrying sink. */
  def writeShards(
      df: DataFrame,
      path: String,
      idCols: Seq[String],
      nShards: Int,
      sortCols: Seq[String] = Nil,
      format: String = "parquet"): String = {
    require(idCols.nonEmpty, "writeShards needs id columns for stable assignment")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val shardCol = "shard"
    // loud, not silent: overwriting a caller's own `shard` column would
    // reassign rows under the same name (e.g. a frame read back from a
    // previous writeShards output)
    require(!df.columns.contains(shardCol),
      s"input already has a '$shardCol' column — drop or rename it first")
    val sharded = df.withColumn(shardCol,
      pmod(xxhash64(idCols.map(col): _*), lit(nShards.toLong)))
    val placed = sharded.repartition(nShards, col(shardCol))
    // lead the sort with the partition column: the partitioned writer
    // requires its data ordered by partition cols and would otherwise
    // insert its own (unstable) sort, destroying the secondary order
    val ordered =
      if (sortCols.nonEmpty)
        placed.sortWithinPartitions((shardCol +: sortCols).map(col): _*)
      else placed
    // pin maxRecordsPerFile OFF: a session-level spark.sql.files
    // .maxRecordsPerFile would otherwise split big shards into multiple
    // part files, silently breaking the one-file-per-shard loader contract
    ordered.write.mode("overwrite").format(format)
      .option("maxRecordsPerFile", 0)
      .partitionBy(shardCol).save(path)
    shardCol
  }

  /** Read a bucketed catalog table (bucket metadata applies automatically —
    * joins/aggs on the bucket key skip their exchange). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Read a JSONL corpus — the de-facto interchange format for LLM training
    * data (one JSON document per line, typically .jsonl or .jsonl.gz).
    *
    * Contract for 100 TB ingests:
    *   - `schema` is REQUIRED: schema inference reads the whole corpus
    *     twice (once to infer, once to load) — never acceptable at scale,
    *     and an explicit schema also prunes unread fields at parse time.
    *   - PERMISSIVE mode with a `_corrupt` capture column: a multi-TB crawl
    *     dump always carries some malformed lines; failing the job on line
    *     3 billion is worse than quarantining. `corrupt` below splits the
    *     read into (clean rows, corrupt raw lines) for a quarantine sink.
    *   - gzip inputs are NOT splittable — one task per .gz file regardless
    *     of size. Fine for the many-small-files layout corpora ship in
    *     (each file one task), ruinous for single huge archives; repack to
    *     parquet/zstd-seekable early in any real pipeline.
    */
  def readJsonl(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      corruptCol: String = "_corrupt"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already has a '$corruptCol' field")
    // text scan + from_json rather than the json datasource: Spark refuses
    // any query whose referenced columns are only the internal corrupt
    // record column of a raw json scan (the quarantine branch is exactly
    // that), and the json source is a line-based text parse anyway — same
    // plan cost, no caching workaround needed
    val full = schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    spark.read.text(path)
      .where(length(trim(col("value"))) > 0) // blank lines are not documents
      .select(col("value"), from_json(col("value"), full,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)).as("j"))
      .select((schema.fieldNames.map(n => col("j." + n)) :+
        // the JSON literal `null` parses to a NULL struct — every field
        // NULL including the capture column, which would classify it as a
        // clean all-NULL ghost row; route it to quarantine explicitly
        coalesce(col("j." + corruptCol),
          when(col("j").isNull, col("value"))).as(corruptCol)).toSeq: _*)
  }

  /** [[readJsonl]] split into (clean rows without the capture column,
    * corrupt raw lines) — quarantine the second, train on the first. */
  def readJsonlQuarantined(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      corruptCol: String = "_corrupt"): (DataFrame, DataFrame) = {
    val raw = readJsonl(spark, path, schema, corruptCol)
    (raw.where(col(corruptCol).isNull).drop(corruptCol),
      raw.where(col(corruptCol).isNotNull).select(col(corruptCol).as("line")))
  }
}
