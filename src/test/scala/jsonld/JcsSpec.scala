package jsonld

import org.scalatest.funsuite.AnyFunSuite
import jsonld.core.Jcs

class JcsSpec extends AnyFunSuite {
  test("ES6 number formatting") {
    assert(Jcs.es6Number(333333333.33333329) == "333333333.3333333")
    assert(Jcs.es6Number(1e30) == "1e+30")
    assert(Jcs.es6Number(4.50) == "4.5")
    assert(Jcs.es6Number(2e-3) == "0.002")
    assert(Jcs.es6Number(0.000000000000000000000000001) == "1e-27")
    assert(Jcs.es6Number(0.0) == "0")
    assert(Jcs.es6Number(-0.0) == "0")
    assert(Jcs.es6Number(1.0) == "1")
    assert(Jcs.es6Number(-1.5) == "-1.5")
    assert(Jcs.es6Number(1e21) == "1e+21")
    assert(Jcs.es6Number(1e20) == "100000000000000000000")
    assert(Jcs.es6Number(0.0000001) == "1e-7")
    assert(Jcs.es6Number(0.000001) == "0.000001")
  }

  test("JCS canonicalization of js12 fixture") {
    val in = "{\n  \"numbers\": [333333333.33333329, 1E30, 4.50, 2e-3, 0.000000000000000000000000001],\n" +
      "  \"string\": \"\\u20ac$\\u000F\\u000aA'\\u0042\\u0022\\u005c\\\\\\\"\\/\",\n" +
      "  \"literals\": [null, true, false]\n}"
    val expected = "{\"literals\":[null,true,false],\"numbers\":[333333333.3333333,1e+30,4.5,0.002,1e-27]," +
      "\"string\":\"€$\\u000f\\nA'B\\\"\\\\\\\\\\\"/\"}"
    assert(Jcs.canonicalize(in) == expected)
  }
}
