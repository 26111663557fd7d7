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

  test("vec_dot returns NULL on length mismatch (not a truncated partial dot)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(CAST(1.0 AS FLOAT)),
        |               array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d""".stripMargin)
      .collect()(0)
    assert(r.isNullAt(0), s"expected NULL, got ${r.get(0)}")
    // and the interpreted (non-codegen) path agrees
    val interp = graft.functions.FloatVecDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
      .eval(null)
    assert(interp == null)
  }

  test("vec_norm and hyperplane_buckets are callable from SQL") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT vec_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n")
      .collect()(0).getDouble(0)
    assert(n === 5.0)
    // same buckets as the Column-API kernel on the same vector
    val sqlBuckets = spark.sql(
      """SELECT hyperplane_buckets(
        |  array(CAST(1.0 AS FLOAT), CAST(-2.0 AS FLOAT), CAST(0.5 AS FLOAT)),
        |  4, 3) AS b""".stripMargin)
      .collect()(0).getSeq[Long](0)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val apiBuckets = Seq(Array(1.0f, -2.0f, 0.5f)).toDF("v")
      .select(graft.functions.VectorExpressions.hyperplaneBuckets(col("v"), 4, 3).as("b"))
      .collect()(0).getSeq[Long](0)
    assert(sqlBuckets === apiBuckets)
  }

  test("ln_fixed is callable from SQL and matches the reference") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT ln_fixed(1000000L) AS l, ln_fixed(0L) AS z").collect()(0)
    assert(got.getLong(0) === graft.functions.FixedPointLn.lnFRef(1000000L))
    assert(got.isNullAt(1)) // out of domain -> NULL
  }

  test("ln_fixed coerces INT literals but rejects DOUBLE") {
    GraftFunctions.register(spark)
    // a bare integer literal is INT — must analyze via the lossless
    // integral up-cast in the registration lambda
    val got = spark.sql("SELECT ln_fixed(5) AS l").collect()(0)
    assert(got.getLong(0) === graft.functions.FixedPointLn.lnFRef(5L))
    // a DOUBLE child must still fail analysis: silently truncating it
    // would corrupt the fixed-point contract
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT ln_fixed(5.5)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("bigint"))
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
