package graft

import graft.functions.StripMarkup
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class MarkupSpec extends SparkSpec {
  import spark.implicits._

  private def strip(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextAnalysis.stripMarkup(col("t")).as("c"))
      .first().getString(0)

  test("tags drop, contents stay, whitespace collapses") {
    assert(strip("<p>Hello <b>world</b>!</p>") === "Hello world !")
    assert(strip("  <div>\n\n a\t b \r\n</div>  ") === "a b")
  }

  test("script and style drop WITH contents, case-insensitively") {
    assert(strip("a<script>var x = 1;</script>b") === "a b")
    assert(strip("a<SCRIPT type='js'>if (1 < 2) {}</SCRIPT>b") === "a b")
    assert(strip("a<style>p { color: red }</style>b") === "a b")
    // unterminated script: the block pattern can't match, the generic tag
    // rule removes only the opening tag — regex-chain parity
    assert(strip("a<script>var x;") === "a var x;")
  }

  test("'<' with no later '>' survives literally; a bracketed span is a tag") {
    assert(strip("1 < 2") === "1 < 2")
    assert(strip("trailing <unclosed") === "trailing <unclosed")
    // regex-chain parity: '< 2 and 3 >' IS a terminated <[^>]*> match —
    // prose angle brackets around text are eaten, exactly like the oracle
    assert(strip("1 < 2 and 3 > 2") === "1 2")
  }

  test("named, numeric, and hex entities decode; unknown survive") {
    assert(strip("Tom &amp; Jerry") === "Tom & Jerry")
    assert(strip("&lt;tag&gt; &quot;q&quot; &apos;a&apos;") === "<tag> \"q\" 'a'")
    assert(strip("a&nbsp;b") === "a b")
    assert(strip("&#65;&#x42;&#x63;") === "ABc")
    assert(strip("&#128512;") === new String(Character.toChars(128512)))
    assert(strip("&bogus; &toolongtomatter; &") === "&bogus; &toolongtomatter; &")
    assert(strip("&#; &#xZZ; &#999999999;") === "&#; &#xZZ; &#999999999;")
  }

  test("entity decode is single-pass: &amp;lt; stays literal &lt;") {
    assert(strip("&amp;lt;b&amp;gt;") === "&lt;b&gt;")
  }

  test("decoded angle brackets are not re-parsed as tags") {
    assert(strip("&lt;script&gt;not code&lt;/script&gt;") === "<script>not code</script>")
  }

  test("null and empty pass through") {
    val out = Seq((1, null: String), (2, ""), (3, "<p>x</p>"))
      .toDF("id", "t")
      .select(col("id"), TextAnalysis.stripMarkup(col("t")).as("c"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getString(1) === "")
    assert(out(2).getString(1) === "x")
  }

  test("decodeEntities/collapseWs helpers match the staged contract") {
    assert(StripMarkup.decodeEntities("no entities here") === "no entities here")
    assert(StripMarkup.collapseWs("\t a  b  c \n") === "a b c")
  }
}
