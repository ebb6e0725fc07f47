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
  * Iterator tokens are `stream#shard#index` — opaque to the connector,
  * positional here. `millisBehindLatest` is a deterministic proxy
  * (1000 · records-behind) so specs can assert lag without wall clocks. */
object MockKinesis {
  private case class MockShard(var info: KinesisShardInfo,
                               records: mutable.ArrayBuffer[KinesisRecord])
  private val streams = TrieMap[String, mutable.LinkedHashMap[String, MockShard]]()

  def reset(): Unit = streams.clear()

  def createStream(name: String, shardIds: Seq[String]): Unit = {
    val m = mutable.LinkedHashMap[String, MockShard]()
    shardIds.foreach(id => m(id) = MockShard(KinesisShardInfo(id), mutable.ArrayBuffer()))
    streams(name) = m
  }

  /** Add a (possibly child) shard with lineage. */
  def addShard(stream: String, info: KinesisShardInfo): Unit =
    streams(stream)(info.shardId) = MockShard(info, mutable.ArrayBuffer())

  def putRecord(stream: String, shardId: String, seq: String, pk: String,
                data: Array[Byte], arrivalMillis: Long = 1700000000000L): Unit =
    streams(stream)(shardId).records += KinesisRecord(seq, pk, data, arrivalMillis)

  /** Close a shard: sets EndingSequenceNumber (the last record's sequence
    * number, or "0" for an empty shard). */
  def closeShard(stream: String, shardId: String): Unit = {
    val s = streams(stream)(shardId)
    val ending = s.records.lastOption.map(_.sequenceNumber).getOrElse("0")
    s.info = s.info.copy(endingSequenceNumber = Some(ending))
  }

  /** Kinesis sequence numbers are large decimal numerics; numeric-aware
    * compare so unpadded test sequences order correctly (the simulator's
    * seqCompare rule). */
  private[sources] def seqCompare(a: String, b: String): Int = {
    def isNum(s: String) = s.nonEmpty && s.forall(_.isDigit)
    if (isNum(a) && isNum(b)) {
      val (sa, sb) = (a.dropWhile(_ == '0'), b.dropWhile(_ == '0'))
      if (sa.length != sb.length) sa.length - sb.length else sa.compareTo(sb)
    } else a.compareTo(b)
  }

  private[sources] def listShards(stream: String): Seq[KinesisShardInfo] =
    streams.getOrElse(stream, throw new IllegalArgumentException(
      s"no such mock stream: $stream")).values.map(_.info).toSeq

  private[sources] def shardIterator(stream: String, shardId: String,
                                     iteratorType: String,
                                     seq: Option[String]): String = {
    val s = streams(stream).getOrElse(shardId,
      throw new IllegalArgumentException(s"no such shard: $shardId"))
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
    s"$stream#$shardId#$idx"
  }

  private[sources] def records(iterator: String, limit: Int): KinesisRecordBatch = {
    val Array(stream, shardId, idxS) = iterator.split('#')
    val s = streams(stream)(shardId)
    val idx = idxS.toInt
    val out = s.records.slice(idx, idx + math.max(0, limit)).toSeq
    val nextIdx = idx + out.length
    val atEnd = nextIdx >= s.records.length
    val next = if (s.info.closed && atEnd) None else Some(s"$stream#$shardId#$nextIdx")
    KinesisRecordBatch(out, next, 1000L * (s.records.length - nextIdx))
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
