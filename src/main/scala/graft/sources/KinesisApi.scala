package graft.sources

/** The minimal Kinesis Data Streams client surface the live connector
  * needs — the reference's own seam (its worker takes a `Client`
  * INTERFACE, `worker/worker.go:29`, precisely so tests can mock the
  * service): exactly the four calls the README "Going online" table maps
  * the simulator internals to.
  *
  * This trait mirrors the public AWS SDK v2 `KinesisClient` operations
  * one-to-one (`ListShards`, `GetShardIterator`, `GetRecords`) so an
  * SDK-backed implementation is mechanical — see the README snippet. The
  * SDK itself cannot resolve in this build (zero egress), which is WHY
  * the connector is written against the trait: everything downstream of
  * these four calls compiles, runs, and is spec-pinned offline against
  * [[MockKinesis]].
  */
trait KinesisApi {
  /** ListShards: every shard of the stream, open and closed, with
    * split/merge lineage. */
  def listShards(stream: String): Seq[KinesisShardInfo]

  /** GetShardIterator. `iteratorType` is one of [[ShardStream.TrimHorizon]],
    * [[ShardStream.Latest]], [[ShardStream.AtSequenceNumber]],
    * [[ShardStream.AfterSequenceNumber]]; the AT/AFTER forms require
    * `startingSequenceNumber`. Returns an opaque iterator token. */
  def getShardIterator(stream: String, shardId: String, iteratorType: String,
                       startingSequenceNumber: Option[String]): String

  /** GetRecords: up to `limit` records from the iterator position. A
    * `nextIterator` of None means the shard is closed AND fully consumed
    * (the SDK's null NextShardIterator). */
  def getRecords(iterator: String, limit: Int): KinesisRecordBatch
}

/** Shard descriptor (SDK `Shard`): a shard is CLOSED when
  * `endingSequenceNumber` is set (`SequenceNumberRange.EndingSequenceNumber`,
  * reference `vendor/.../kinesis/api.go:1609-1627`). */
case class KinesisShardInfo(shardId: String,
                            parentShardId: Option[String] = None,
                            adjacentParentShardId: Option[String] = None,
                            endingSequenceNumber: Option[String] = None) {
  def closed: Boolean = endingSequenceNumber.isDefined
  def parents: Seq[String] = parentShardId.toSeq ++ adjacentParentShardId.toSeq
}

/** The failure shape of a stale iterator token (SDK
  * `ExpiredIteratorException` — real GetShardIterator tokens expire after
  * 5 minutes). An SDK-backed [[KinesisApi]] maps the SDK exception to
  * this; the connector catches it at poll/reader level and fresh-seeks
  * from the durable position (lossless for AT/AFTER/BATCH positions;
  * an unresolved LATEST re-subscribes at "now", inherent to LATEST). */
class ExpiredIteratorException(message: String) extends RuntimeException(message)

/** One record (SDK `Record`): sequence numbers are opaque, totally
  * ordered strings per shard. */
case class KinesisRecord(sequenceNumber: String, partitionKey: String,
                         data: Array[Byte], approximateArrivalMillis: Long)

/** GetRecords result (SDK `GetRecordsResponse`). */
case class KinesisRecordBatch(records: Seq[KinesisRecord],
                              nextIterator: Option[String],
                              millisBehindLatest: Long)

/** Serializable factory shipped to executors — a real SDK client holds
  * sockets and credentials and cannot be serialized, so partitions carry
  * the RECIPE (region, credentials provider, endpoint) and build the
  * client task-side. Implementations must be cheap to construct or cache
  * internally. */
trait KinesisApiFactory extends Serializable {
  def create(): KinesisApi
}

/** Reflection seam for the DataSource options path: `apiFactoryClass`
  * names a zero-arg [[KinesisApiFactory]] implementation. The shipped
  * build has [[graft.sources.MockKinesisFactory]] (tests/demos); an
  * AWS-backed deployment points it at the user's SDK wrapper. */
object KinesisApiFactory {
  def instantiate(className: String): KinesisApiFactory =
    Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[KinesisApiFactory]
}
