package graft.sources

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

/** In-memory Kinesis service double behind [[KinesisApi]] — the offline
  * stand-in for the AWS SDK client that [[KinesisMicroBatchStream]] is
  * compiled and spec-pinned against (the reference mocks its `Client`
  * interface the same way in worker tests). State lives in a JVM-global
  * registry keyed by stream name, so local-mode executor tasks (same JVM)
  * and the driver observe one stream — the chaos-hook pattern
  * [[ShardStream.chaosInjectedFailures]] already uses.
  *
  * Iterator tokens are `stream#shard#index#generation` — opaque to the
  * connector, positional here. `millisBehindLatest` is a deterministic
  * proxy (1000 · records-behind) so specs can assert lag without wall
  * clocks.
  *
  * Real-service behaviors the mock pins:
  *  - AT/AFTER_SEQUENCE_NUMBER seeks REJECT a sequence number that
  *    belongs to a different shard of the stream (the service throws
  *    InvalidArgumentException — sequence numbers are per-shard), so the
  *    connector's per-shard start map is exercised, not hidden.
  *  - [[expireIterators]] bumps the stream's iterator generation; every
  *    outstanding token then throws [[ExpiredIteratorException]] (the
  *    service expires tokens after 5 minutes), pinning the connector's
  *    fresh-seek fallback.
  *  - [[setGetRecordsLatencyMillis]] injects a per-call service RTT, and
  *    [[maxConcurrentGetRecords]] records the high-water in-flight
  *    GetRecords count — the pin that a slow shard does not serialize
  *    the driver's planning poll. */
object MockKinesis {
  private case class MockShard(var info: KinesisShardInfo,
                               records: mutable.ArrayBuffer[KinesisRecord])
  private case class MockStream(shards: mutable.LinkedHashMap[String, MockShard],
                                generation: java.util.concurrent.atomic.AtomicInteger =
                                  new java.util.concurrent.atomic.AtomicInteger(0))
  private val streams = TrieMap[String, MockStream]()
  @volatile private var getRecordsLatencyMillis = 0L
  private val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  private val maxInFlight = new java.util.concurrent.atomic.AtomicInteger(0)

  def reset(): Unit = {
    streams.clear()
    getRecordsLatencyMillis = 0L
    getRecordsJitterMillis = 0L
    resetConcurrencyStats()
  }

  def createStream(name: String, shardIds: Seq[String]): Unit = {
    val m = mutable.LinkedHashMap[String, MockShard]()
    shardIds.foreach(id => m(id) = MockShard(KinesisShardInfo(id), mutable.ArrayBuffer()))
    streams(name) = MockStream(m)
  }

  /** Add a (possibly child) shard with lineage. */
  def addShard(stream: String, info: KinesisShardInfo): Unit =
    streams(stream).shards(info.shardId) = MockShard(info, mutable.ArrayBuffer())

  def putRecord(stream: String, shardId: String, seq: String, pk: String,
                data: Array[Byte], arrivalMillis: Long = 1700000000000L): Unit =
    streams(stream).shards(shardId).records += KinesisRecord(seq, pk, data, arrivalMillis)

  /** Close a shard: sets EndingSequenceNumber (the last record's sequence
    * number, or "0" for an empty shard). */
  def closeShard(stream: String, shardId: String): Unit = {
    val s = streams(stream).shards(shardId)
    val ending = s.records.lastOption.map(_.sequenceNumber).getOrElse("0")
    s.info = s.info.copy(endingSequenceNumber = Some(ending))
  }

  /** Invalidate every outstanding iterator token of the stream — the
    * service's 5-minute expiry, on demand. Tokens issued AFTER this call
    * are valid; older ones throw [[ExpiredIteratorException]]. */
  def expireIterators(stream: String): Unit =
    streams(stream).generation.incrementAndGet()

  /** Injected service RTT per GetRecords call (all streams). */
  def setGetRecordsLatencyMillis(millis: Long): Unit =
    getRecordsLatencyMillis = millis

  /** Per-SHARD deterministic jitter on top of the base RTT: shard s sleeps
    * an extra `hash(s) mod maxMillis` per GetRecords call. Reproducible
    * (pure function of the shard id — no RNG, no flake) while giving a
    * many-shard stream the heterogeneous latency profile the planning
    * fan-out must absorb (VERDICT r14 #7: the single-slow-shard pin never
    * exercised `planningParallelism` under a realistic spread). */
  def setGetRecordsJitterMillis(maxMillis: Long): Unit =
    getRecordsJitterMillis = maxMillis
  @volatile private var getRecordsJitterMillis = 0L
  private def latencyFor(shardId: String): Long = {
    val jitter = if (getRecordsJitterMillis > 0)
      (shardId.hashCode.toLong & Long.MaxValue) % getRecordsJitterMillis
    else 0L
    getRecordsLatencyMillis + jitter
  }

  /** High-water count of concurrently in-flight GetRecords calls since
    * the last [[resetConcurrencyStats]]. */
  def maxConcurrentGetRecords: Int = maxInFlight.get()

  def resetConcurrencyStats(): Unit = { inFlight.set(0); maxInFlight.set(0) }

  /** Kinesis sequence numbers are large decimal numerics; numeric-aware
    * compare so unpadded test sequences order correctly (shared with the
    * connector's range-end check, [[KinesisStream.seqCompare]]). */
  private[sources] def seqCompare(a: String, b: String): Int =
    KinesisStream.seqCompare(a, b)

  private[sources] def listShards(stream: String): Seq[KinesisShardInfo] =
    streams.getOrElse(stream, throw new IllegalArgumentException(
      s"no such mock stream: $stream")).shards.values.map(_.info).toSeq

  private[sources] def shardIterator(stream: String, shardId: String,
                                     iteratorType: String,
                                     seq: Option[String]): String = {
    val st = streams(stream)
    val s = st.shards.getOrElse(shardId,
      throw new IllegalArgumentException(s"no such shard: $shardId"))
    // the real service rejects a sequence number owned by another shard
    // (InvalidArgumentException): sequence numbers are per-shard
    for {
      q <- seq
      if iteratorType == ShardStream.AtSequenceNumber ||
        iteratorType == ShardStream.AfterSequenceNumber
      if !s.records.exists(_.sequenceNumber == q)
      owner <- st.shards.find { case (oid, os) =>
        oid != shardId && os.records.exists(_.sequenceNumber == q)
      }
    } throw new IllegalArgumentException(
      s"InvalidArgumentException: sequence number $q belongs to shard " +
        s"${owner._1}, not $shardId (sequence numbers are per-shard)")
    val idx = iteratorType match {
      case ShardStream.TrimHorizon => 0
      case ShardStream.Latest      => s.records.length
      case ShardStream.AtSequenceNumber =>
        s.records.indexWhere(r => seqCompare(r.sequenceNumber, seq.get) >= 0) match {
          case -1 => s.records.length
          case i  => i
        }
      case ShardStream.AfterSequenceNumber =>
        s.records.indexWhere(r => seqCompare(r.sequenceNumber, seq.get) > 0) match {
          case -1 => s.records.length
          case i  => i
        }
      case other => throw new IllegalArgumentException(s"iterator type $other")
    }
    s"$stream#$shardId#$idx#${st.generation.get()}"
  }

  private[sources] def records(iterator: String, limit: Int): KinesisRecordBatch = {
    val Array(stream, shardId, idxS, genS) = iterator.split('#')
    val st = streams(stream)
    if (genS.toInt != st.generation.get())
      throw new ExpiredIteratorException(
        s"Iterator expired for shard $shardId (generation $genS < ${st.generation.get()})")
    val cur = inFlight.incrementAndGet()
    maxInFlight.getAndUpdate(m => math.max(m, cur))
    try {
      val lat = latencyFor(shardId)
      if (lat > 0) Thread.sleep(lat)
      val s = st.shards(shardId)
      val idx = idxS.toInt
      val out = s.records.slice(idx, idx + math.max(0, limit)).toSeq
      val nextIdx = idx + out.length
      val atEnd = nextIdx >= s.records.length
      val next = if (s.info.closed && atEnd) None
        else Some(s"$stream#$shardId#$nextIdx#${st.generation.get()}")
      KinesisRecordBatch(out, next, 1000L * (s.records.length - nextIdx))
    } finally inFlight.decrementAndGet()
  }
}

class MockKinesis extends KinesisApi {
  override def listShards(stream: String): Seq[KinesisShardInfo] =
    MockKinesis.listShards(stream)
  override def getShardIterator(stream: String, shardId: String,
                                iteratorType: String,
                                startingSequenceNumber: Option[String]): String =
    MockKinesis.shardIterator(stream, shardId, iteratorType, startingSequenceNumber)
  override def getRecords(iterator: String, limit: Int): KinesisRecordBatch =
    MockKinesis.records(iterator, limit)
}

/** The zero-arg factory `apiFactoryClass` points at in tests/demos. */
class MockKinesisFactory extends KinesisApiFactory {
  override def create(): KinesisApi = new MockKinesis
}
