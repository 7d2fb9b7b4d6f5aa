package graft

import graft.model.{Document, Typed}

class TypedModelSpec extends SparkSpec {
  test("typed loaders round the corpus through case-class encoders") {
    val docs = Typed.documents(spark, sfDir)
    val d: Document = docs.head()
    assert(d.text.nonEmpty && d.n_chars == d.text.length)
    assert(Typed.embeddings(spark, sfDir).head().embedding.length == 64)
    val e = Typed.events(spark, sfDir).head()
    assert(e.ts != null && e.event_type.nonEmpty)
    // typed transform: filter+map survives the encoder
    import spark.implicits._
    val langs = docs.map(_.lang).distinct().collect().toSet
    assert(langs.contains("en"))
  }
}
