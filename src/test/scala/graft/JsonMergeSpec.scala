package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[JsonMerge.setTopLevelKey]] — the upsert [[IsoProbe]] uses to
  * merge its `isolated` block into ScaleExp's refit record.
  */
class JsonMergeSpec extends AnyFunSuite {

  test("insert into an empty object") {
    assert(JsonMerge.setTopLevelKey("{}", "a", "1") == """{"a":1}""")
  }

  test("append after existing keys, nested objects left intact") {
    val in = """{"x":{"t1":1.0,"beta":0.9},"y":[1,2,3]}"""
    assert(JsonMerge.setTopLevelKey(in, "isolated", """{"q":{"r":2.0}}""") ==
      """{"x":{"t1":1.0,"beta":0.9},"y":[1,2,3],"isolated":{"q":{"r":2.0}}}""")
  }

  test("replace an existing top-level key, wherever it sits") {
    val in = """{"isolated":{"old":1},"x":{"t1":1.0}}"""
    assert(JsonMerge.setTopLevelKey(in, "isolated", """{"new":2}""") ==
      """{"x":{"t1":1.0},"isolated":{"new":2}}""")
  }

  test("a nested key with the same name is NOT mistaken for top-level") {
    val in = """{"x":{"isolated":true},"y":1}"""
    assert(JsonMerge.setTopLevelKey(in, "isolated", "2") ==
      """{"x":{"isolated":true},"y":1,"isolated":2}""")
  }

  test("commas and braces inside string values don't split entries") {
    val in = """{"note":"a,b}{[","x":1}"""
    assert(JsonMerge.setTopLevelKey(in, "k", "3") ==
      """{"note":"a,b}{[","x":1,"k":3}""")
  }

  test("idempotent: upserting the same key twice keeps one entry") {
    val once = JsonMerge.setTopLevelKey("""{"a":1}""", "k", "2")
    assert(JsonMerge.setTopLevelKey(once, "k", "2") == once)
  }
}
