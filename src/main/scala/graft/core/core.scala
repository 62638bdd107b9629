package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One engine capability exposed to the driver's correctness gate.
  *
  * `run` evaluates the operator over the driver-generated parquet tables in
  * `sfDir`; `oracle` is the equivalent ANSI SQL the driver replays in DuckDB
  * over the same tables. Column names/aliases must match exactly (the driver
  * sorts columns by name before hashing values).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)

/** Injected run parameterization (SURVEY.md §7.1 step 1): the logical
  * "today" every as-of computation derives from. The reference reads the
  * wall clock at transform time (reference `data_transformer.py:118–119`,
  * `airflow/dags/etl_daily_pipeline.py:180–183`), which makes runs
  * non-reproducible; here the as-of date is an explicit input, so a rerun
  * or backfill with the same context is bit-identical (property-tested in
  * ContextSpec). */
final case class RunContext(asOfDate: java.time.LocalDate) {
  /** The as-of date as a foldable DATE column. */
  def asOfCol: Column = lit(asOfDate.toString).cast(DateType)
}

object RunContext {
  /** Deterministic default pinned to the corpus's final order date — the
    * gates' stand-in for "today". A production deployment passes the
    * scheduler's execution date instead. */
  val default: RunContext = RunContext(java.time.LocalDate.parse("1998-12-31"))
}

object core {

  /** Table names shipped in every /root/testdata/sf* directory. */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one driver-generated parquet table. Plain parquet scan: Catalyst
    * pushes filters + prunes columns into the scan, so callers should never
    * pre-materialize. */
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Bind `c` to a lambda VARIABLE for the scope of `f`, evaluating it
    * exactly once per row. Higher-order functions run interpreted with no
    * cross-lambda subexpression elimination, so a lambda body that
    * references a non-attribute argument expression re-evaluates it on
    * EVERY element access — e.g. `element_at(split(text), i)` inside a
    * `transform` re-ran the split on each element: O(tokens²) per document
    * (a 70k-token doc spun for minutes; found via jstack). A 1-element
    * `transform` is the standard binding trick: `array(c)` evaluates c
    * once, and the lambda body sees a cheap variable lookup. Attribute
    * references don't need this — only composite expressions do. */
  def bindOnce(c: Column)(f: Column => Column): Column =
    get(transform(array(c), f), lit(0))

  /** Collision-free tag for an input dir, usable in SQL identifiers and
    * paths: the sanitized dir itself (not its hashCode — 32-bit hashes can
    * collide across dirs, and `math.abs(Int.MinValue)` is negative). */
  def dirTag(dir: String): String = dir.replaceAll("[^A-Za-z0-9]", "_")

  /** JVM-wide named locks for staged side artifacts and shared checkpoint
    * cycles: a bare marker check-then-act is not atomic, so two concurrent
    * executions in one JVM (the spec suite beside verify/bench) could
    * interleave staging writes or watermark read-modify-write cycles. One
    * lock object per key serializes them; [[buildOnce]] is the marker
    * idiom (the loser re-checks under the lock and skips). */
  private val namedLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def withLock[T](key: String)(body: => T): T = {
    val lock = namedLocks.computeIfAbsent(key, _ => new Object)
    lock.synchronized(body)
  }
  def buildOnce(key: String)(alreadyBuilt: => Boolean)(build: => Unit): Unit =
    withLock(key) {
      if (!alreadyBuilt) {
        val t0 = System.nanoTime()
        build
        recordBuild(s"stage:$key", (System.nanoTime() - t0) / 1e9)
      }
    }

  /** JVM-wide ledger of one-time build costs (r20 verdict #1 / r21 verdict
    * #2: materialize-once marts, memos and staged landings are paid in
    * pass 1 only, so the bench's interleaved min-of-2 erases them from
    * every reported number). Every builder that runs at most once per
    * (corpus snapshot, JVM) records its wall seconds here under a stable
    * key; Bench dumps the ledger into `target/bench_detail.json` as
    * `build` rows, so the artifact separates steady-state consumer cost
    * (the timed samples) from cold-build cost — WITHOUT changing what the
    * timed samples measure (comparability with prior rounds holds). */
  private val buildLedgerM = scala.collection.mutable.LinkedHashMap[String, Double]()
  def recordBuild(key: String, sec: Double): Unit =
    buildLedgerM.synchronized { buildLedgerM(key) = buildLedgerM.getOrElse(key, 0.0) + sec }
  def buildLedger: Seq[(String, Double)] =
    buildLedgerM.synchronized { buildLedgerM.toSeq }

  /** Driver-side overlap pool for independent Spark actions (guide §2.6).
    * The gates previously parked blocking actions on
    * `ExecutionContext.Implicits.global`, whose fork-join pool is sized to
    * the core count — enough concurrent gates (or futures also waiting on
    * MartCache's build lock) could occupy every worker with PARKED threads
    * and serialize the overlap (r21 ADVICE). A cached DAEMON pool never
    * starves on blocked threads: a driver action is an I/O-shaped wait,
    * 2–6 in flight is the normal case, and idle threads are reclaimed
    * after 60 s. */
  implicit lazy val actionEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-action")
        t.setDaemon(true)
        t
      }))

  /** Scratch dir for landing zones / stage handoffs, keyed by the input dir
    * so different scale factors never collide. Rooted at the process working
    * directory (overridable via `graft.scratch.dir`) rather than a hardcoded
    * absolute path. */
  def scratch(dir: String, name: String): String = {
    val base = sys.props.getOrElse("graft.scratch.dir",
      s"${sys.props("user.dir")}/target/graft-scratch")
    s"$base/${dirTag(dir)}/$name"
  }

  /** Cheap content signature of one or more source parquet tables (file
    * names + sizes + mtimes, hashed): used to key derived layouts (landing
    * zones, bucketed tables) so regenerated source data can never be served
    * from a stale derived copy — mtime catches a regenerated table whose
    * files happen to keep the same names and byte sizes. */
  def sourceSig(spark: SparkSession, dir: String, names: String*): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val parts = names.flatMap { n =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$n.parquet")
      p.getFileSystem(conf).listStatus(p)
        .map(st => s"$n/${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.sorted.mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
  }

  /** The `events` table with its timestamp column normalized to MICROSECOND
    * LONGS (`us`) — the one place the events-time contract lives. The driver
    * has shipped `ts` in two physical shapes across rounds: INT64 nanoseconds
    * (read as LONG under `spark.sql.legacy.parquet.nanosAsLong=true`, where
    * ns→µs is an integer `div 1000` — the same truncation DuckDB applies) and
    * a native parquet TIMESTAMP(MICROS). This adapter dispatches on the
    * *observed* schema so both shapes land on identical epoch-micros longs;
    * sessions run with `spark.sql.session.timeZone=UTC`, so the NTZ→micros
    * conversion equals DuckDB's `epoch_us(ts)`. Consumers that want an
    * epoch-micros long (sessionization arithmetic) read `us`; consumers that
    * want a timestamp use [[events]]. */
  def eventsUs(spark: SparkSession, dir: String): DataFrame = {
    val raw = tbl(spark, dir, "events")
    val us = raw.schema("ts").dataType match {
      case LongType         => expr("ts div 1000")            // int64 nanos → µs
      case TimestampNTZType =>
        // the NTZ→TimestampType cast below is tz-SENSITIVE: it reinterprets
        // the wall-clock fields in the session zone, so any zone other than
        // UTC would shift every event time and surface only as downstream
        // hash mismatches — fail loudly here instead (round-11 ADVICE)
        val tz = spark.conf.get("spark.sql.session.timeZone")
        // compare zone RULES, not the id string: Etc/UTC, GMT, +00:00 are
        // all exactly UTC and must not fail a correct deployment
        val isUtc = try {
          java.time.ZoneId.of(tz).getRules.isFixedOffset &&
            java.time.ZoneId.of(tz).getRules.getOffset(java.time.Instant.EPOCH)
              .getTotalSeconds == 0
        } catch { case _: java.time.DateTimeException => false }
        require(isUtc,
          s"events.ts is TIMESTAMP_NTZ and spark.sql.session.timeZone=$tz; " +
            "the NTZ→micros conversion is only oracle-equivalent under UTC — " +
            "set the session timezone to UTC (Verify/Bench/specs all do)")
        unix_micros(col("ts").cast(TimestampType))
      case TimestampType    => unix_micros(col("ts"))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other (expected LONG nanos or TIMESTAMP)")
    }
    raw.withColumn("ts", us) // in-place: keeps column position
      .withColumnRenamed("ts", "us")
  }

  /** [[eventsUs]] with the micros re-surfaced as a microsecond
    * TIMESTAMP_NTZ `ts` column (the shape most calendar/window queries
    * want). Derived, so the truncation rule cannot diverge between the
    * long and timestamp views. */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsUs(spark, dir)
      .withColumn("us", expr("timestamp_micros(us)").cast(TimestampNTZType))
      .withColumnRenamed("us", "ts")

  // ---------------------------------------------------------------------
  // Determinism helpers for oracle (DuckDB) hash-parity.
  //
  // Floating-point SUM/AVG is evaluation-order-dependent, and Spark and
  // DuckDB will not add doubles in the same order. Money math therefore
  // goes through exact DecimalType: cast each input to DECIMAL(18,2),
  // sum exactly (associative), and only then convert to double for
  // ratios — both engines then perform identical IEEE ops on identical
  // inputs, giving bit-equal results at any parallelism/scale.
  // ---------------------------------------------------------------------

  /** Exact 2-dp decimal view of a (possibly double) money column. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact money sum normalized to DECIMAL(38,2) (matches the oracle's
    * `CAST(sum(CAST(x AS DECIMAL(18,2))) AS DECIMAL(38,2))`). Keep this for
    * *intermediate* math; final outputs should go through [[moneySumD]]. */
  def moneySum(c: Column): Column = sum(dec2(c)).cast(DecimalType(38, 2))

  /** [[moneySum]] converted to DOUBLE for final output. The sum itself is
    * exact decimal (order-insensitive); the one final decimal→double
    * conversion is exact while |sum| < 2^53/100 ≈ 9e13, so both engines
    * emit identical doubles. Final outputs use DOUBLE rather than decimal
    * because the two engines' client layers render decimals differently
    * (trailing zeros, scale), which breaks value-hash comparison even when
    * the numbers are equal. Oracle twin:
    * `CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`. */
  def moneySumD(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact-decimal column converted to DOUBLE for final output (same
    * rationale as [[moneySumD]]). */
  def d(c: Column): Column = c.cast(DoubleType)

  /** Order-insensitive average: exact decimal sum divided as double.
    * Equivalent oracle: `CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) /
    * CAST(count(*) AS DOUBLE)`. */
  def moneyAvg(c: Column): Column =
    sum(dec2(c)).cast(DoubleType) / count(lit(1)).cast(DoubleType)

  /** Conditional 1/0 counter that sums to BIGINT on both engines. */
  def countIf(cond: Column): Column =
    sum(when(cond, 1L).otherwise(0L))

  /** Spark day-of-week with the 0=Monday convention the reference's
    * Python/loader path uses (SURVEY.md §2.3 F9; reference
    * `loaders/warehouse_loader.py:194–204`). Oracle: `isodow(d) - 1`. */
  def dowMon0(c: Column): Column =
    ((dayofweek(c) + lit(5)) % lit(7)).cast(IntegerType)

  /** `yyyyMMdd` integer date key (reference `warehouse_loader.py:196`).
    * Oracle: `CAST(strftime(d, '%Y%m%d') AS INTEGER)`. */
  def dateKey(c: Column): Column =
    date_format(c, "yyyyMMdd").cast(IntegerType)

  /** Release every block a query may have left in session memory: the
    * catalog cache AND raw RDD-level persists. `localCheckpoint` blocks
    * live outside the CacheManager, so `clearCache()` alone left them
    * pinned for the rest of the session (the round-9 suite-inflation
    * suspect); Verify and Bench call this between queries so each
    * measurement starts from a cold cache pool. Safe between queries —
    * results are already materialized — but NOT mid-query: an unpersisted
    * localCheckpoint cannot be recomputed (its lineage is truncated). */
  def releaseSessionState(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
