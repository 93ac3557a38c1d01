package graft.text

import graft.SparkSpec

class RedactionSpec extends SparkSpec {
  import spark.implicits._

  test("plants emails, IPs and phones; counts and scrub both correct") {
    val docs = Seq(
      (1L, "contact me at alice@example.com or bob.smith+x@mail.co.uk today"),
      (2L, "server 10.0.0.1 talks to 192.168.1.254 nightly"),
      (3L, "call +1 555 867-5309 or 44 020 7946 0958"),
      (4L, "no pii here at all")
    ).toDF("doc_id", "text")
    val got = Redaction.scrub(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(got(1L) == ((2, 0, 0)))
    assert(got(2L) == ((0, 2, 0)))
    assert(got(3L) == ((0, 0, 2)))
    assert(got(4L) == ((0, 0, 0)))

    val text = Redaction.scrubbedText(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(text(1L) == "contact me at [EMAIL] or [EMAIL] today")
    assert(text(2L) == "server [IP] talks to [IP] nightly")
    assert(!text(3L).exists(_.isDigit), s"digits must be gone: ${text(3L)}")
    assert(text(4L) == "no pii here at all")
  }

  test("email scrubs before phone: numeric local-parts are not double-hit") {
    val docs = Seq((1L, "mail 555 123-4567@example.com now")).toDF("doc_id", "text")
    val text = Redaction.scrubbedText(docs).collect()(0).getString(1)
    assert(text.contains("[EMAIL]"))
  }
}
