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

  /** (float32 bit pattern, str(np.float32)) pairs captured verbatim from
    * numpy 1.26.4 — edge values (zeros, powers, denormals, max/min normal,
    * the 1e-4/1e16 positional-scientific boundaries) plus 60 random finite
    * bit patterns (seed 42). */
  private val numpyF32Cases: Seq[(Int, String)] = Seq(
    (0x00000000, "0.0"),
    (0x80000000, "-0.0"),
    (0x3f800000, "1.0"),
    (0xbf800000, "-1.0"),
    (0x3dcccccd, "0.1"),
    (0xbdcccccd, "-0.1"),
    (0x3f000000, "0.5"),
    (0xbf000000, "-0.5"),
    (0x3fc00000, "1.5"),
    (0xbfc00000, "-1.5"),
    (0x40000000, "2.0"),
    (0xc0000000, "-2.0"),
    (0x4b800000, "16777216.0"),
    (0xcb800000, "-16777216.0"),
    (0x38d1b717, "1e-04"),
    (0xb8d1b717, "-1e-04"),
    (0x38d1b719, "0.00010000001"),
    (0xb8d1b719, "-0.00010000001"),
    (0x38d1b716, "9.999999e-05"),
    (0xb8d1b716, "-9.999999e-05"),
    (0x38e6afcd, "0.00011"),
    (0xb8e6afcd, "-0.00011"),
    (0x3727c5ac, "1e-05"),
    (0xb727c5ac, "-1e-05"),
    (0x387fda40, "6.1e-05"),
    (0xb87fda40, "-6.1e-05"),
    (0x5a0e1bca, "1e+16"),
    (0xda0e1bca, "-1e+16"),
    (0x5a0e1bc9, "9999999000000000.0"),
    (0xda0e1bc9, "-9999999000000000.0"),
    (0x58635fa9, "1000000000000000.0"),
    (0xd8635fa9, "-1000000000000000.0"),
    (0x4cbebc20, "100000000.0"),
    (0xccbebc20, "-100000000.0"),
    (0x4ceb79a3, "123456790.0"),
    (0xcceb79a3, "-123456790.0"),
    (0x449a522b, "1234.5677"),
    (0xc49a522b, "-1234.5677"),
    (0x42f6e979, "123.456"),
    (0xc2f6e979, "-123.456"),
    (0x7f7fffff, "3.4028235e+38"),
    (0xff7fffff, "-3.4028235e+38"),
    (0x00800000, "1.1754944e-38"),
    (0x80800000, "-1.1754944e-38"),
    (0x00000001, "1e-45"),
    (0x80000001, "-1e-45"),
    (0x00000002, "3e-45"),
    (0x80000002, "-3e-45"),
    (0x00403ecd, "5.9e-39"),
    (0x80403ecd, "-5.9e-39"),
    (0x32d6bf95, "2.5e-08"),
    (0xb2d6bf95, "-2.5e-08"),
    (0x3901742d, "0.00012345678"),
    (0xb901742d, "-0.00012345678"),
    (0x40490fdb, "3.1415927"),
    (0xc0490fdb, "-3.1415927"),
    (0x402df854, "2.7182817"),
    (0xc02df854, "-2.7182817"),
    (0xa3b1799d, "-1.9241884e-17"),
    (0x1c80317f, "8.483124e-22"),
    (0x06671ad1, "4.3465973e-35"),
    (0xbdd640fb, "-0.10461613"),
    (0x46685257, "14868.585"),
    (0x3eb13b90, "0.34615755"),
    (0x392456de, "0.0001567262"),
    (0x23b8c1e9, "2.0031444e-17"),
    (0xbc8960a9, "-0.016769724"),
    (0x1a3d1fa7, "3.9109853e-23"),
    (0xad3c2d6d, "-1.0696649e-11"),
    (0xbd9c66b3, "-0.07636776"),
    (0xe465e150, "-1.696216e+22"),
    (0x8b9d2434, "-6.052867e-32"),
    (0x16419f82, "1.5640748e-25"),
    (0x972a8469, "-5.509709e-25"),
    (0x6c031199, "6.3380954e+26"),
    (0x0822e8f3, "4.902393e-34"),
    (0x07a0ca6e, "2.4193102e-34"),
    (0x17fc695a, "1.6311713e-24"),
    (0x37f8a88b, "2.9642388e-05"),
    (0x3b8faa18, "0.0043842904"),
    (0x815ef6d1, "-4.0952042e-38"),
    (0x9a1de644, "-3.2652846e-23"),
    (0x06cb0fb3, "7.638318e-35"),
    (0x8fadc1a6, "-1.7133708e-29"),
    (0x32e70629, "2.689474e-08"),
    (0xb74d0fb1, "-1.2222606e-05"),
    (0xa65ed389, "-7.7308406e-16"),
    (0xb38a088c, "-6.4276804e-08"),
    (0x8b8148f6, "-4.979877e-32"),
    (0x6b65a6a4, "2.7763095e+26"),
    (0x386ecbe0, "5.6933495e-05"),
    (0x72ff5d2a, "1.0116007e+31"),
    (0x96da1dac, "-3.5238525e-25"),
    (0x47378190, "46977.562"),
    (0xcf36d58b, "-3067448000.0"),
    (0xde8a774b, "-4.988763e+18"),
    (0x01a9e71f, "6.241244e-38"),
    (0xc241330b, "-48.299847"),
    (0xce4a2bbd, "-847966000.0"),
    (0x28df6ec4, "2.480601e-14"),
    (0xb2b9437a, "-2.156752e-08"),
    (0x6c307511, "8.532951e+26"),
    (0x571aa876, "170048320000000.0"),
    (0x47229389, "41619.535"),
    (0x27cd8130, "5.7038995e-15"),
    (0x371ecd7b, "9.465376e-06"),
    (0xf50bea63, "-1.7736406e+32"),
    (0xc37459ee, "-244.35129"),
    (0x562b0f79, "47020736000000.0"),
    (0x1a2a73ed, "3.524882e-23"),
    (0x17be3111, "1.2290848e-24"),
    (0x6142ea7d, "2.2472281e+20"),
    (0x18c26797, "5.0252424e-24"),
    (0x5be6128e, "1.2951929e+17"),
    (0xd8f56413, "-2158481300000000.0"),
    (0x580d7b71, "622245270000000.0"),
    (0x9a8dca03, "-5.86426e-23"),
    (0x43b7a3a6, "367.2785")
  )

  test("numpy float32 scalar repr parity (shortest round-trip at 32-bit width)") {
    for ((bits, expected) <- numpyF32Cases) {
      val f = java.lang.Float.intBitsToFloat(bits)
      assert(PyStr.float32Repr(f) === expected, f"bits=0x$bits%08x value=$f")
    }
    assert(PyStr.float32Repr(Float.NaN) === "nan")
    assert(PyStr.float32Repr(Float.PositiveInfinity) === "inf")
    assert(PyStr.float32Repr(Float.NegativeInfinity) === "-inf")
    // every rendered string must round-trip to the exact same float32
    for ((bits, _) <- numpyF32Cases) {
      val f = java.lang.Float.intBitsToFloat(bits)
      val s = PyStr.float32Repr(f)
      val back = java.lang.Float.parseFloat(s)
      assert(java.lang.Float.floatToIntBits(back) ===
        java.lang.Float.floatToIntBits(f), s)
    }
  }
}
