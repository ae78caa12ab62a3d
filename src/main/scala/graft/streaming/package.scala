package graft

/** Streaming layer.
  *
  * Note on Kafka (S7, SURVEY.md §2.1): the reference declares a Kafka
  * send/receive module but never implements it (`common/kafka/__init__.py:
  * 1-3` is a docstring-only stub). This engine mirrors that declared
  * intent: the topology in [[graft.streaming.IngestTopology]] reads file
  * queues, and switching a queue to Kafka is a source/sink swap —
  * `spark.readStream.format("kafka").option("subscribe", topic)` /
  * `writeStream.format("kafka")` — with no change to the dedup gates,
  * merge, or upsert logic. No Kafka broker exists in this environment, so
  * the swap is documented rather than tested.
  */
package object streaming
