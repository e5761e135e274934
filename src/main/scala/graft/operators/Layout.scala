package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout management: co-located bucketed tables.
  *
  * A fact⋈fact join (orders⋈lineitem on the order key) shuffles BOTH
  * sides on every query. Writing the facts bucketed + sorted on the
  * join key moves that cost to write time, once: every subsequent join
  * on the key consumes bucket-local sorted runs with ZERO exchange and
  * zero sort (proven by `PlanSpec`'s bucketed-join guard). At 100 TB
  * this is the difference between an O(data) shuffle per query and a
  * metadata-only plan — the single biggest repeatable-cost lever the
  * engine exposes.
  *
  * Both sides must use the SAME bucket count; Spark's requirement for
  * the exchange to be elided.
  */
object Layout {

  /** Write `df` as a bucketed + in-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit =
    df.write
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the
    * catalog — a plain parquet read of the same files would NOT carry
    * the co-location guarantee).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Write `df` hive-partitioned on `partCols` (low-cardinality keys —
    * ingest date, source, language). A filter on a partition column
    * then prunes whole directories at PLANNING time (`PartitionFilters`
    * on the scan): a day's query over a year of data lists one
    * directory and reads 1/365th of the bytes. The companion lever to
    * bucketing — pruning cuts what is read, bucketing cuts what is
    * shuffled.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** Read a partitioned layout back; partition columns are recovered
    * from the directory structure. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Crash-safe directory swap: the current `path` (if any) renames to
    * a `__old` backup, the fully-written `tmp` renames in, then the
    * backup is dropped. Renames are metadata operations, so the window
    * where `path` is absent is two namenode calls — and a crash inside
    * it leaves the backup intact: [[recoverSwap]] (called by every
    * consumer first) restores it instead of silently losing state. */
  private[graft] def swapIn(fs: org.apache.hadoop.fs.FileSystem,
                            path: String, tmp: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__old")
    fs.delete(old, true)
    if (fs.exists(p)) fs.rename(p, old)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
    fs.delete(old, true)
  }

  /** Restore `path` from its `__old` backup if a previous swap crashed
    * between the two renames (path gone, backup present). */
  private[graft] def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
                                 path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__old")
    if (!fs.exists(p) && fs.exists(old)) fs.rename(old, p)
  }

  /** Compact a directory of small parquet files (the residue of
    * micro-batch sinks and over-parallel writes) into ~`targetFiles`
    * right-sized ones: a round-robin repartition — no shuffle key
    * needed, sizes equalize — then a crash-safe swap (see [[swapIn]]).
    * At 100 TB the listing/open overhead of millions of KB-files
    * dominates scan time; periodic compaction is what keeps
    * streaming-written tables scannable. Returns the number of data
    * files after compaction. */
  def compact(spark: SparkSession, path: String, targetFiles: Int): Int = {
    val tmp = path.stripSuffix("/") + "__compacting"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, path)
    spark.read.parquet(path)
      .repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp)
    swapIn(fs, path, tmp)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Training-shard export: write `df` as parquet shards of at most
    * `rowsPerShard` rows each, plus a manifest DataFrame (shard file
    * name, row count) read back from the written footers.
    *
    * Shape: `maxRecordsPerFile` enforces the per-file bound inside each
    * write task (no extra pass), and the up-front `repartition(shards)`
    * spreads rows so the dataloader-facing output is balanced — the
    * export step of a tokenized dataset, where shard size bounds
    * loader memory and shard count bounds parallelism. The manifest
    * comes from parquet footer metadata only (no data re-read).
    */
  def writeSharded(df: DataFrame, path: String,
                   rowsPerShard: Long): DataFrame = {
    require(rowsPerShard > 0)
    val spark = df.sparkSession
    // materialize once: the sizing count() and the write would otherwise
    // each execute the full upstream pipeline
    val src = df.localCheckpoint(true)
    val n = src.count()
    val shards = math.max(1L, (n + rowsPerShard - 1) / rowsPerShard).toInt
    src.repartition(shards)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", rowsPerShard)
      .parquet(path)
    import spark.implicits._
    spark.read.parquet(path)
      .select(input_file_name().as("shard"))
      .groupBy("shard").agg(count(lit(1)).as("n_rows"))
      .select(element_at(split(col("shard"), "/"), -1).as("shard"),
        col("n_rows"))
  }

  /** Morton (Z-order) interleave of two non-negative 16-bit column
    * values into one 32-bit key — pure codegen'd bit twiddling. Rows
    * close in BOTH dimensions are close in z, which is what makes the
    * z-sorted layout skippable on either column. */
  def morton2(x: Column, y: Column): Column = {
    def spread(c: Column): Column = {
      var v = c.cast("long").bitwiseAND(lit(0xFFFFL))
      v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
      v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x33333333L))
      v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
  }

  /** Z-ordered layout: range-partition + sort on the interleaved key,
    * so each output file covers a compact RECTANGLE of (x, y) space
    * instead of a slice of one column. A selective predicate on either
    * column then touches only the files whose rectangle intersects it,
    * and parquet min/max stats skip the rest — multi-dimensional data
    * skipping without any table format, the standard layout trick for
    * "filter by date AND tenant" at 100 TB. ZOrderSpec proves the
    * file-touch reduction. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String,
                    yCol: String, nFiles: Int): Unit =
    df.withColumn("__z", morton2(col(xCol), col(yCol)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
