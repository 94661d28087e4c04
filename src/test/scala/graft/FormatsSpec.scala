package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.sources.Formats

/** Format round-trips: values and schema survive JSONL, ORC, and CSV. */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("out").toString

  /** name:type pairs — file sources legitimately mark everything nullable. */
  private def shape(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.schema.fields.map(f => f.name -> f.dataType.sql).toSeq

  private def rich = Seq(
    (1L, "alpha", 1.5, Seq(1, 2, 3)),
    (2L, "beta \"quoted\", with comma", -0.25, Seq.empty[Int]),
    (3L, null.asInstanceOf[String], 0.0, Seq(42))
  ).toDF("id", "name", "score", "xs")

  test("jsonl round-trip preserves nested arrays, nulls, schema") {
    val p = tmp("jsonl")
    Formats.writeJsonl(rich, p)
    val back = Formats.readJsonl(spark, p, rich.schema).orderBy("id")
    assert(shape(back) == shape(rich))
    // JSONL drops null fields on write; normalize via collect comparison
    assert(back.collect().toSeq == rich.orderBy("id").collect().toSeq)
  }

  test("orc round-trip preserves values and schema") {
    val p = tmp("orc")
    Formats.writeOrc(rich, p)
    val back = Formats.readOrc(spark, p, rich.schema).orderBy("id")
    assert(shape(back) == shape(rich))
    assert(back.collect().toSeq == rich.orderBy("id").collect().toSeq)
  }

  test("csv round-trip preserves scalars incl. quoted delimiters") {
    val p = tmp("csv")
    val scalars = rich.drop("xs")
    Formats.writeCsv(scalars, p, delimiter = ";")
    val back = Formats.readCsv(spark, p, scalars.schema, delimiter = ";").orderBy("id")
    assert(shape(back) == shape(scalars))
    assert(back.collect().toSeq == scalars.orderBy("id").collect().toSeq)
  }

  test("jsonl FAILFAST read surfaces malformed rows; PERMISSIVE nulls them") {
    val dir = Files.createTempDirectory("badjson")
    Files.write(dir.resolve("a.jsonl"),
      "{\"id\":1,\"name\":\"ok\"}\nnot json at all\n".getBytes)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("name", "string")
    val permissive = Formats.readJsonl(spark, dir.toString, schema).collect()
    assert(permissive.length == 2 && permissive.count(_.isNullAt(0)) == 1)
    val ff = intercept[Exception] {
      Formats.readJsonl(spark, dir.toString, schema, failFast = true).collect()
    }
    assert(ff.getMessage != null)
  }

  test("readEvolvedParquet: added columns union in, old rows null-fill; type conflicts fail") {
    val d1 = tmp("evo1"); val d2 = tmp("evo2")
    Seq((1L, "a")).toDF("id", "name").write.parquet(d1)
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(d2)
    val merged = Formats.readEvolvedParquet(spark, Seq(d1, d2)).orderBy("id")
    assert(shape(merged).map(_._1) == Seq("id", "name", "score"))
    val rows = merged.collect()
    assert(rows(0).isNullAt(2) && rows(1).getDouble(2) == 9.5)
    // a shared column that CHANGED type is a loud failure, not a coercion
    val d3 = tmp("evo3")
    Seq((3, "c")).toDF("id", "name").write.parquet(d3) // id int vs long
    val err = intercept[Exception] {
      Formats.readEvolvedParquet(spark, Seq(d1, d3)).collect()
    }
    assert(err.getMessage != null)
  }

  test("readFixedWidth: column slicing, trim, short-line nulls") {
    val dir = Files.createTempDirectory("fw")
    Files.write(dir.resolve("a.dat"), (
      "001  alice  NY\n" + // id[3] name[7] state[2] with padding
      "002  bob    CA\n" +
      "003  carol\n"       // short line: state column past the end
    ).getBytes)
    val out = Formats.readFixedWidth(spark, dir.toString,
        Seq("id" -> 3, "name" -> 7, "state" -> 4))
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))))
    assert(out(0) == (("001", "alice", Some("NY"))), out.mkString("|"))
    assert(out(1) == (("002", "bob", Some("CA"))))
    assert(out(2) == (("003", "carol", None))) // truncated record -> null
  }
}
