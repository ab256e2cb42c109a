package graft.enrich.js

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Property test for the schema-aware JS-value normalization: for ANY
  * value the sandbox can hand back and ANY declared column type, the
  * normalized value must be accepted by Catalyst's row converter (the
  * original failure mode was a ClassCastException killing the job at
  * materialization), and representable numerics must survive with their
  * value intact. */
class JsNormalizeSpec extends SparkSpec {

  private val types: Seq[DataType] = Seq(
    StringType, DoubleType, FloatType, LongType, IntegerType, BooleanType,
    TimestampType, DateType, DecimalType(38, 9), BinaryType,
    ArrayType(DoubleType), ArrayType(StringType),
    MapType(StringType, LongType), MapType(StringType, StringType))

  private def randomJsValue(rnd: scala.util.Random, depth: Int = 0): Any =
    rnd.nextInt(if (depth > 1) 8 else 10) match {
      case 0 => null
      case 1 => MiniJs.Undefined
      case 2 => rnd.nextLong() % 1000000
      case 3 => rnd.nextDouble() * 1000 - 500
      case 4 => if (rnd.nextBoolean()) rnd.nextInt(100).toString
        else rnd.nextString(5)
      case 5 => rnd.nextBoolean()
      case 6 => (rnd.nextInt(200) * 1.0) // whole double
      case 7 => rnd.nextInt(3) match {
        case 0 => "true"
        case 1 => "12.5"
        case _ => "not-a-number"
      }
      case 8 =>
        mutable.ArrayBuffer(Seq.fill(rnd.nextInt(4))(randomJsValue(rnd, depth + 1)): _*)
      case _ =>
        val m = mutable.LinkedHashMap.empty[String, Any]
        (0 until rnd.nextInt(4)).foreach(i => m(s"k$i") = randomJsValue(rnd, depth + 1))
        m
    }

  test("normalize(value, type) is always Catalyst-convertible (5000 random cases)") {
    val rnd = new scala.util.Random(42)
    types.foreach { t =>
      val schema = StructType(Seq(StructField("v", t, nullable = true)))
      val values = Seq.fill(5000 / types.size)(
        JsCustomMapper.normalize(randomJsValue(rnd), t))
      // the assertion IS the absence of a converter exception here
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(values.map(Row(_)), 2), schema)
      assert(df.count() == values.size)
    }
  }

  test("representable numerics survive with value intact; lossy ones go null") {
    import JsCustomMapper.normalize
    assert(normalize(42L, DoubleType) == 42.0)
    assert(normalize(42L, IntegerType) == 42)
    assert(normalize(3.0, LongType) == 3L)
    assert(normalize(Long.MaxValue, IntegerType) == null) // out of range
    assert(normalize(2.5, LongType) == null) // non-whole
    assert(normalize("17", LongType) == 17L)
    assert(normalize("x", LongType) == null)
    assert(normalize(1.5, StringType) == "1.5")
    assert(normalize(3.0, StringType) == "3") // JS whole-double format
    assert(normalize(mutable.ArrayBuffer(1L, 2L), ArrayType(DoubleType)) ==
      Seq(1.0, 2.0))
    val m = mutable.LinkedHashMap[String, Any]("a" -> 1L)
    assert(normalize(m, MapType(StringType, DoubleType)) == Map("a" -> 1.0))
    // structured value into a scalar slot cannot be represented → null
    assert(normalize(mutable.ArrayBuffer(1L), LongType) == null)
  }
}
