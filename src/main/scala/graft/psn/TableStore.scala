package graft.psn

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sink abstraction (SURVEY §2.2 K1-K6) over a parquet warehouse directory.
  *
  * append  = K1/K2 (`insert_rows_from_dataframe` / WRITE_APPEND loads)
  * overwrite = K3 (WRITE_TRUNCATE)
  * merge   = K4 (`UPDATE … FROM temp` — read-join-overwrite, made
  *           atomic-enough via write-to-temp-dir + directory swap, the
  *           parquet stand-in for BigQuery DML atomicity; Delta MERGE plans
  *           the same join when a transactional format is available)
  * drop    = K5 (`delete_table(not_found_ok=True)`)
  *
  * The empty-append guard the reference needs (main.py:184) is a no-op here:
  * appending an empty DataFrame writes no row files.
  */
final class TableStore(spark: SparkSession, warehouse: String) {

  private def path(table: String): Path = Paths.get(warehouse, table)

  def exists(table: String): Boolean = Files.exists(path(table))

  def read(table: String): DataFrame =
    spark.read.parquet(path(table).toString)

  def append(table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(path(table).toString)

  /** Append with hive-style partitioning — the 100 TB layout for fact
    * tables (time_play partitioned by day): date-filtered scans prune whole
    * partition directories instead of reading and filtering. */
  def appendPartitioned(table: String, df: DataFrame,
      partitionCol: String): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partitionCol)
      .parquet(path(table).toString)

  def overwrite(table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path(table).toString)

  /** Upsert: replace `target` with `Ops.mergeUpdates(target, updates)`.
    * The rewritten table materializes into `<table>.__tmp` first, then swaps
    * directories — readers never observe a half-written table, and the source
    * scan is never overwritten while still being read (the classic
    * read-overwrite-same-path parquet trap). */
  def merge(table: String, updates: DataFrame): Unit = {
    val tmp = Paths.get(warehouse, table + ".__tmp")
    val merged = Ops.mergeUpdates(read(table), updates)
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val live = path(table)
    val retired = Paths.get(warehouse, table + ".__old")
    deleteRecursive(retired)
    Files.move(live, retired, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursive(retired)
  }

  def drop(table: String): Unit = deleteRecursive(path(table)) // K5

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }
}
