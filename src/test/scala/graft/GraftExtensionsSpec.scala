package graft

class GraftExtensionsSpec extends SparkSpec {

  test("vec_dot is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
      .collect()(0).getDouble(0)
    assert(r === 11.0)
  }

  test("extensions class injects the same descriptors (startup path)") {
    // exercise the SparkSessionExtensions wiring itself
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // applying to a registry-less container is enough to prove the inject
    // calls are well-formed; SQL-callability is covered above
    succeed
  }
}
