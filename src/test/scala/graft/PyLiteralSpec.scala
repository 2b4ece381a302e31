package graft

import graft.functions.{PyLiteral, PyStr}
import org.scalatest.funsuite.AnyFunSuite

class PyLiteralSpec extends AnyFunSuite {
  test("python dict literal → JSON") {
    assert(PyLiteral.toJson("{'a': 1, 'b': 'x'}") === """{"a": 1, "b": "x"}""")
  }
  test("python constants") {
    assert(PyLiteral.toJson("{'a': None, 'b': True, 'c': False}") ===
      """{"a": null, "b": true, "c": false}""")
  }
  test("nested structures and tuples") {
    assert(PyLiteral.toJson("[{'xs': (1, 2)}, {'xs': [3]}]") ===
      """[{"xs": [1, 2]}, {"xs": [3]}]""")
  }
  test("quotes inside strings") {
    assert(PyLiteral.toJson("{'a': 'it\\'s', 'b': \"say \\\"hi\\\"\"}") ===
      """{"a": "it's", "b": "say \"hi\""}""")
    assert(PyLiteral.toJson("""{'a': "double's fine"}""") === """{"a": "double's fine"}""")
  }
  test("valid JSON passes through") {
    assert(PyLiteral.toJson("""{"k": 87}""") === """{"k": 87}""")
    assert(PyLiteral.toJson("""{"s": "with 'single'"}""") === """{"s": "with 'single'"}""")
  }
  test("null input and NaN") {
    assert(PyLiteral.toJson(null) === null)
    assert(PyLiteral.toJson("{'v': nan}") === """{"v": null}""")
  }
  test("newlines in strings escape") {
    assert(PyLiteral.toJson("{'a': 'l1\nl2'}") === "{\"a\": \"l1\\nl2\"}")
  }

  test("python float repr forms") {
    assert(PyStr.floatRepr(1.5) === "1.5")
    assert(PyStr.floatRepr(2.0) === "2.0")
    assert(PyStr.floatRepr(-3.0) === "-3.0")
    assert(PyStr.floatRepr(185.22) === "185.22")
    assert(PyStr.floatRepr(1e16) === "1e+16")
    assert(PyStr.floatRepr(0.00001) === "1e-05")
    // Python keeps plain decimals where Java would use exponents
    assert(PyStr.floatRepr(0.0005) === "0.0005")
    assert(PyStr.floatRepr(12345678.5) === "12345678.5")
    assert(PyStr.floatRepr(-0.00012) === "-0.00012")
    assert(PyStr.floatRepr(1.234e15 + 0.5) === "1234000000000000.5")
  }
}
