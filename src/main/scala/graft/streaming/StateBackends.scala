package graft.streaming

/** State-store backend selection for the streaming operators (Q1-Q6).
  *
  * The default (HDFS-backed in-memory map) holds every key in executor
  * memory — fine for the catalog-sized task table, wrong for corpus-scale
  * streaming state (e.g. ingest dedup over billions of fingerprints).
  * RocksDB keeps keyed state on local SSD with block-cache reads and
  * ships only changelogs to the checkpoint location, so state size is
  * bounded by disk, not heap, and checkpoint traffic is O(delta) rather
  * than O(state).
  *
  * Apply before starting the query:
  * {{{
  *   StateBackends.rocksDb.foreach { case (k, v) => spark.conf.set(k, v) }
  * }}}
  */
object StateBackends {

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Route RocksDB's native log stream away from the JNI callback.
    *
    * Spark's state store wraps a `LoggerJniCallback` around slf4j and
    * derives the NATIVE InfoLogLevel from the level of the
    * `...streaming.state.RocksDB` logger (WARN-enabled ⇒ WARN_LEVEL, so
    * every native flush/compaction warning crosses the JNI boundary).
    * Under rate-source load that callback SIGSEGV'd a bench JVM
    * (rocksdb::LoggerJniCallback::Logv, hs_err in stress_artifacts/r7/)
    * — a known-fragile path when native logging races logger disposal
    * at db close. Spark offers no conf to drop the logger entirely, but
    * turning this one log4j logger OFF pins the native level at
    * ERROR_LEVEL (the floor Spark uses when nothing is enabled), so the
    * callback effectively never fires. Spark-side state-store warnings
    * on OTHER loggers (provider, maintenance) are unaffected. */
  def quietNativeLogger(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.streaming.state.RocksDB",
      org.apache.logging.log4j.Level.OFF)

  /** RocksDB state store + changelog checkpointing (incremental
    * checkpoints: upload the batch's changes, not a full snapshot).
    * Accessing the conf map also quiets the native logger (above) —
    * every RocksDB-backed run wants both, and the accessor is the one
    * choke point all call sites (bench, specs, mains) already share. */
  def rocksDb: Map[String, String] = {
    quietNativeLogger()
    Map(
      "spark.sql.streaming.stateStore.providerClass" -> RocksDbProvider,
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")
  }
}
