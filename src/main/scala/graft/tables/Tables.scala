package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{DataType, LongType}

/** Parquet-backed table access for the driver corpus (TESTDATA.md).
  *
  * Mirrors the reference's persistent-table abstraction (BigQuery tables,
  * `/root/reference/main.py:53-57`) re-expressed as Spark catalog-free parquet
  * scans. Column pruning / predicate pushdown happen automatically in the
  * parquet scan (the reference pushed its projection manually via SQL text,
  * `/root/reference/main.py:153`).
  *
  * At 100 TB these would be catalog tables (partitioned + bucketed on their
  * join keys); the loader keeps the call sites identical either way.
  */
object Tables {
  val corpus: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Corpus scans memoize per (session, dir, table): a corpus directory
    * is immutable for a run, so the file listing + footer schema read
    * behind `spark.read.parquet` is pure fixed cost — paying it once per
    * JVM instead of once per statement matters for the script paths,
    * which re-register every corpus view per statement (a catalog, which
    * is what this map is, is exactly what a production engine caches).
    * The DataFrame is a lazy plan: reuse shares the resolved relation,
    * never computed results. */
  private val loadCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    loadCache.computeIfAbsent(
      (System.identityHashCode(spark), dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `ts` is nanoseconds-since-epoch as a LONG for every consumer. The
    * driver corpus is TIMESTAMP(NANOS) parquet, which Spark reads as a
    * nanosecond long under `legacy.parquet.nanosAsLong`; a rewritten copy
    * of the table (e.g. the 10×/100× scale replicas, which round-trip
    * through micros TIMESTAMP) normalizes here, so downstream integer
    * epoch arithmetic (`ts div 1e9`) is physical-layout-independent. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case t => df.withColumn("ts", tsNanosExpr(s, t))
    }
  }

  /** Normalization of the events `ts` physical type to a nanosecond-LONG
    * column — the single place both the batch reader above and the
    * streaming reader ([[graft.streaming.Streams.readEvents]]) get their
    * expression AND their guards from, so the two paths can never drift
    * (a streaming-only copy once relied on a "session tz is UTC" comment
    * where batch threw loudly).
    *
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet — what the driver
    * corpus switched to in round 6 — reads as TIMESTAMP_NTZ. The naive
    * wall-clock values ARE the instants every consumer and every DuckDB
    * oracle (`epoch(ts)` on a naive TIMESTAMP) computes with, so the
    * lossless normalization is naive-as-UTC → nanos. The NTZ→LTZ cast
    * applies the SESSION zone, so demand UTC loudly rather than silently
    * shifting every bucket by the host offset. */
  private[graft] def tsNanosExpr(s: SparkSession, physical: DataType): Column =
    physical match {
      case LongType => col("ts")
      case org.apache.spark.sql.types.TimestampType =>
        expr("unix_micros(ts) * 1000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        val tz = s.conf.get("spark.sql.session.timeZone", "")
        if (tz != "UTC") throw new IllegalStateException(
          s"events.ts is TIMESTAMP_NTZ; session timeZone must be UTC " +
            s"for the naive-as-UTC normalization, got '$tz'")
        expr("unix_micros(cast(ts as timestamp)) * 1000")
      // Anything else (e.g. a sub-micro layout that would silently
      // truncate) must surface as an error, not a reinterpretation.
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other — expected " +
          "nanosecond LONG (driver corpus under nanosAsLong), micros " +
          "TIMESTAMP (rewritten replicas), or micros TIMESTAMP_NTZ " +
          "(driver corpus from round 6)")
    }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
