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

  /** RocksDB state store + changelog checkpointing (incremental
    * checkpoints: upload the batch's changes, not a full snapshot). */
  val rocksDb: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" -> RocksDbProvider,
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")
}
