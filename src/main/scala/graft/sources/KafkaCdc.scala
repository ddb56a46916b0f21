package graft.sources

/** Kafka wiring for the CDC pipeline — CONFIG-ONLY in this sandbox
  * (no Kafka connector jar, no broker; SURVEY.md §7.2 "keep the Kafka
  * path thin and obviously-correct").
  *
  * Builds the exact option maps a `spark.readStream.format("kafka")` /
  * `writeStream.format("kafka")` call takes, mirroring the reference's
  * consumption surface:
  *  - topic-per-table naming `{prefix}.{db}.{table}`
  *    (`/root/reference/bin/mskc-connector.sh:398`, `README.md:436`)
  *  - include-list → subscribe pattern (`bin/mskc-connector.sh:406`)
  *  - from-beginning replay (`bin/kafka-client.sh:33,:39`)
  *  - datetime offset reset (`README.md:41`)
  *  - keyed produce with string keys (`bin/mskc-connector.sh:438`)
  */
object KafkaCdc {

  final case class SourceSpec(format: String, options: Map[String, String])

  def topicFor(prefix: String, db: String, table: String): String =
    s"$prefix.$db.$table"

  /** Subscribe pattern covering every table of the include-listed
    * databases — the engine-side image of `database.include.list`.
    */
  def subscribePattern(prefix: String, includeDbs: Seq[String]): String =
    s"^${Regex.quote(prefix)}\\.(${includeDbs.map(Regex.quote).mkString("|")})\\..+$$"

  private object Regex {
    def quote(s: String): String = java.util.regex.Pattern.quote(s)
  }

  /** Streaming source spec. `startingTimestamp` (epoch ms) expresses the
    * reference's `--reset-offsets --to-datetime` replay; absent ⇒
    * from-beginning (`--from-beginning`).
    */
  def source(bootstrapServers: String,
             topicPrefix: String,
             includeDbs: Seq[String],
             startingTimestamp: Option[Long] = None): SourceSpec = {
    val base = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribePattern" -> subscribePattern(topicPrefix, includeDbs),
      // at-least-once + downstream dedup (A4), matching the deployed
      // stack's delivery contract — never silently lose data:
      "failOnDataLoss" -> "true")
    val offsets = startingTimestamp match {
      case Some(ts) => Map("startingTimestamp" -> ts.toString)
      case None => Map("startingOffsets" -> "earliest")
    }
    SourceSpec("kafka", base ++ offsets)
  }

  /** Keyed sink spec (K1): the producing side writes `key` (string PK)
    * and `value` (encoded envelope) to the per-table `topic` column —
    * exactly the projection [[graft.cdc.EnvelopeCodec.encode]] emits.
    */
  def sink(bootstrapServers: String, checkpointLocation: String)
      : SourceSpec =
    SourceSpec("kafka", Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "checkpointLocation" -> checkpointLocation))
}
