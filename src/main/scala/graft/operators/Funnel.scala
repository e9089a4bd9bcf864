package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ordered-progression funnel (view → click → purchase; queued →
  * rendering → completed) — the SCALE form.
  *
  * The relational form (per-stage min() + join back, see
  * `q_funnel_conversion`) is oracle-checkable but scans the event table
  * once per stage arm. This form is one shuffle on the entity key and one
  * sorted in-partition scan with O(1) state per entity (the same
  * secondary-sort layout as the rate clamp and sequence packing): each
  * entity advances to stage i+1 on the first stage-(i+1) event STRICTLY
  * after the event that completed stage i — identical semantics to the
  * join form's `ts > prev_ts` predicate.
  *
  * Returns (entity, deepest 1-based stage index reached). Entities with no
  * stage-1 event are absent.
  */
object Funnel {

  def deepestStage(events: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    // the entity key stays in its NATIVE type — a cast-to-long would null
    // out non-numeric keys and silently empty the funnel (join-form
    // parity: q_funnel_conversion works for any scalar key type)
    val entityType = events.select(col(entityCol)).schema.head.dataType
    val prepared = events
      .select(col(entityCol).as("entity"),
        col(typeCol).cast("string").as("etype"),
        // micros: exact timestamp representation for strict ordering
        unix_micros(col(tsCol).cast("timestamp")).as("ts_us"))
      // null-entity and null-ts rows carry no progression signal and
      // would NPE the primitive getters below — dropped explicitly
      .filter(col("entity").isNotNull && col("ts_us").isNotNull)
      .repartition(col("entity"))
      .sortWithinPartitions(col("entity"), col("ts_us"))
    implicit val enc = Encoders.row(StructType(Seq(
      StructField("entity", entityType), StructField("deepest", IntegerType))))
    val stageArr = stages.toArray
    prepared.mapPartitions { rows =>
      new Iterator[Row] {
        private val it = rows.buffered
        override def hasNext: Boolean = it.hasNext
        override def next(): Row = {
          val entity = it.head.get(0)
          var depth = 0
          var lastTs = Long.MinValue
          while (it.hasNext && it.head.get(0) == entity) {
            val r = it.next()
            if (depth < stageArr.length && r.getString(1) == stageArr(depth) &&
                r.getLong(2) > lastTs) {
              // strict ">": an event at the same instant as the previous
              // stage's completing event does not advance (join-form parity)
              lastTs = r.getLong(2)
              depth += 1
            }
          }
          Row(entity, depth)
        }
      }.filter(_.getInt(1) >= 1)
    }
  }

  case class FunnelEvent(entity: String, etype: String, tsMillis: Long)
  case class FunnelProgress(entity: String, deepest: Int, lastTsMillis: Long)

  /** Streaming form of [[deepestStage]]: per-entity O(1) state
    * (deepest stage reached, completing event's timestamp) advanced by
    * `flatMapGroupsWithState` — emits a row whenever an entity's depth
    * changes. Events are applied in timestamp order WITHIN a micro-batch;
    * across batches the state machine assumes per-entity arrival is not
    * so late that a stage-completing event precedes an already-consumed
    * one (same strict `ts > lastTs` advance as the batch scan — a late
    * event can never retro-advance; bound lateness upstream with a
    * watermark if sources reorder). On an in-order stream the final state
    * per entity equals the batch [[deepestStage]] row — parity-tested.
    */
  def advanceFunnel(stages: Seq[String])(
      entity: String,
      events: Iterator[FunnelEvent],
      state: org.apache.spark.sql.streaming.GroupState[FunnelProgress]): Iterator[FunnelProgress] = {
    val stageArr = stages.toArray
    val prev = state.getOption.getOrElse(FunnelProgress(entity, 0, Long.MinValue))
    var depth = prev.deepest
    var lastTs = prev.lastTsMillis
    events.toSeq.sortBy(e => (e.tsMillis, e.etype)).foreach { e =>
      if (depth < stageArr.length && e.etype == stageArr(depth) && e.tsMillis > lastTs) {
        lastTs = e.tsMillis
        depth += 1
      }
    }
    if (depth != prev.deepest) {
      val st = FunnelProgress(entity, depth, lastTs)
      state.update(st)
      Iterator.single(st)
    } else Iterator.empty
  }

  def deepestStageStream(events: org.apache.spark.sql.Dataset[FunnelEvent],
      stages: Seq[String]): org.apache.spark.sql.Dataset[FunnelProgress] = {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    implicit val pEnc = E.product[FunnelProgress]
    events.groupByKey(_.entity)(E.STRING)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(advanceFunnel(stages))
  }

  /** Per-stage entity counts from [[deepestStage]] (stage i counts every
    * entity that reached i or deeper). Every stage in 1..stages.length
    * gets a row — a stage nobody reached reports 0, matching the join
    * form's per-stage aggregates. */
  def stageCounts(deepest: DataFrame, stages: Seq[String]): DataFrame = {
    val byDepth = deepest.groupBy("deepest").count()
    val exploded = byDepth.select(
      explode(sequence(lit(1), col("deepest"))).as("stage_idx"), col("count"))
    val reached = exploded.groupBy("stage_idx").agg(sum("count").as("n_entities"))
    val allStages = deepest.sparkSession.range(1, stages.length + 1)
      .select(col("id").cast("int").as("stage_idx"))
    allStages.join(reached, Seq("stage_idx"), "left")
      .select(col("stage_idx"), coalesce(col("n_entities"), lit(0L)).as("n_entities"))
      .orderBy("stage_idx")
  }
}
