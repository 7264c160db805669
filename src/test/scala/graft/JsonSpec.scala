package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.Json

/** The oracle_sql.json escape path — a bad escape zeroes the round. */
class JsonSpec extends AnyFunSuite {
  test("escapes quotes, backslashes, and every control char") {
    assert(Json.str("a\"b") == "\"a\\\"b\"")
    assert(Json.str("a\\b") == "\"a\\\\b\"")
    assert(Json.str("a\nb\tc\rd") == "\"a\\nb\\tc\\rd\"")
    assert(Json.str("x\u0001y") == "\"x\\u0001y\"")
    assert(Json.str("plain") == "\"plain\"")
  }

  test("every declared oracle SQL string survives a JSON round-trip") {
    val json = Json.obj(SparkEntry.oracleSql)
    // parse with a strict hand-rolled check: balanced braces + no raw control chars
    assert(json.startsWith("{") && json.endsWith("}"))
    assert(!json.exists(c => c < ' '), "raw control char leaked into JSON")
    // spot-check structure: every query name appears as a quoted key
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(json.contains("\"" + k + "\""), s"missing key $k")
    }
  }
}
