package graft

import org.apache.spark.sql.functions._
import graft.operators.Script

/** script processor analogue: the beatEventV0 mutation surface
  * (Get/Put/Rename/Delete/Cancel/Tag/AppendTo) over distributed events. */
class ScriptSpec extends SparkSpec {
  import spark.implicits._

  private def oneEvent(fields: (String, String)*): Script.Event =
    Script.Event(fields.toMap, Map.empty)

  test("put overwrites and returns the previous value; get misses are null") {
    val out = Script.run(Seq(oneEvent("a" -> "1")).toDS()) { e =>
      assert(e.get("missing") == null)
      assert(e.put("a", "2") == "1")   // returns old (beatevent put)
      assert(e.put("b", "x") == null)
    }.collect()(0)
    assert(out.fields == Map("a" -> "2", "b" -> "x"))
  }

  test("rename fails when target exists or source missing (no overwrite)") {
    val out = Script.run(Seq(oneEvent("a" -> "1", "b" -> "2")).toDS()) { e =>
      assert(!e.rename("a", "b"))      // fields cannot be overwritten
      assert(!e.rename("zzz", "c"))    // missing source
      assert(e.rename("a", "c"))
    }.collect()(0)
    assert(out.fields == Map("b" -> "2", "c" -> "1"))
  }

  test("appendTo converts a scalar to an array and dedups; tag targets tags") {
    val out = Script.run(Seq(oneEvent("err" -> "first")).toDS()) { e =>
      e.appendTo("err", "second")
      e.appendTo("err", "second")      // already present → no-op
      e.tag("t1"); e.tag("t1"); e.tag("t2")
    }.collect()(0)
    assert(out.fields.get("err").isEmpty) // scalar moved into the array field
    assert(out.lists("err") == Seq("first", "second"))
    assert(out.lists("tags") == Seq("t1", "t2"))
  }

  test("appendTo on an absent field stores a scalar; tag stores an array " +
    "(appendString alwaysArray, beatevent_v0.go:262-270)") {
    val out = Script.run(Seq(oneEvent()).toDS()) { e =>
      e.appendTo("err", "only")        // absent + alwaysArray=false → scalar
      e.tag("t1")                      // absent + alwaysArray=true → array
    }.collect()(0)
    assert(out.fields("err") == "only" && !out.lists.contains("err"))
    assert(out.lists("tags") == Seq("t1"))
    // second distinct value converts the scalar to an array
    val out2 = Script.run(Seq(oneEvent()).toDS()) { e =>
      e.appendTo("err", "a"); e.appendTo("err", "b")
    }.collect()(0)
    assert(out2.lists("err") == Seq("a", "b") && !out2.fields.contains("err"))
  }

  test("appendTo of an equal scalar is a strict no-op (shape preserved)") {
    val out = Script.run(Seq(oneEvent("err" -> "x")).toDS()) { e =>
      e.appendTo("err", "x")           // value already present as a scalar
      assert(e.get("err") == "x")      // NOT converted to an array
    }.collect()(0)
    assert(out.fields("err") == "x" && !out.lists.contains("err"))
  }

  test("fields and lists are one namespace: put replaces an array key, delete clears both") {
    val out = Script.run(Seq(oneEvent()).toDS()) { e =>
      e.tag("x")
      e.put("tags", "y")               // put over an array key replaces it
      assert(e.getList("tags") == null && e.get("tags") == "y")
      e.appendTo("p", "1")
      assert(e.delete("p"))            // delete removes array-shaped keys too
      assert(e.getList("p") == null)
    }.collect()(0)
    assert(out.fields("tags") == "y" && !out.lists.contains("tags"))
    assert(!out.lists.contains("p"))
  }

  test("cancel drops the event, like the processor's nil return") {
    val ds = Seq(oneEvent("k" -> "keep"), oneEvent("k" -> "drop")).toDS()
    val out = Script.run(ds)(e => if (e.get("k") == "drop") e.cancel())
    assert(out.collect().map(_.fields("k")).toSeq == Seq("keep"))
  }

  test("events() wraps string columns; nulls are absent keys") {
    val df = Seq(("c1", Some("x")), ("c2", None))
      .toDF("conv_id", "maybe")
    val evs = Script.events(df, "conv_id", "maybe").collect()
    assert(evs(0).fields == Map("conv_id" -> "c1", "maybe" -> "x"))
    assert(evs(1).fields == Map("conv_id" -> "c2"))
  }
}
