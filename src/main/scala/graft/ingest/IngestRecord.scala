package graft.ingest

/** The unit of data of the reference engine: a document record routed to
  * an index, keyed by a document id, carrying an arbitrary JSON body
  * (reference: destructuring at core.clj:58-61, JSON serialization at
  * core.clj:59-60).
  *
  * `source` is the pass-through lane of SURVEY §1.3: a raw JSON string,
  * never forced through a global schema, so heterogeneous documents
  * survive a byte-faithful 1:1 copy (core.clj:139). Schema-on-read
  * consumers use from_json over it instead.
  */
final case class IngestRecord(indexId: String, docId: String, source: String)
