package graft.compile

import com.fasterxml.jackson.core.JsonGenerator

/** Per-thread reusable capture machinery for the lowered `json_*` family.
  *
  * Every captured subtree (a [[ScanFusion]] slot, a projection element in
  * [[JsonProjectionCount]], a navigation step in [[JsonPathRaw]]) serializes
  * through a Jackson generator into a writer. Allocating those per capture
  * costs a `StringWriter` (whose backing `StringBuffer` takes a monitor per
  * append) plus a full `WriterBasedJsonGenerator` per value — on a fused
  * multi-column scan that is N allocations per record. This pool keeps ONE
  * (sink, generator) pair per concurrent capture per executor thread, alive
  * for the life of the task thread.
  *
  * Reuse across values is sound because each capture writes exactly one
  * complete root-level JSON value: after it completes, the generator's write
  * context is back at root, and the root-value separator is disabled so the
  * next value starts at sink offset 0 with no injected space. A capture that
  * dies mid-value (malformed document — the callers' catch-all paths) leaves
  * the generator in a nested context, so such pairs are NEVER released back
  * to the pool; they are simply dropped for GC and the pool re-creates on
  * next acquire (release happens only after a successful [[finish]]).
  */
private[compile] object CapturePool {

  /** Growable unsynchronized char sink (the `StringWriter` replacement). */
  final class CharSink extends java.io.Writer {
    private var buf = new Array[Char](128)
    private var len = 0
    private def ensure(cap: Int): Unit =
      if (cap > buf.length) {
        var n = buf.length << 1
        while (n < cap) n <<= 1
        buf = java.util.Arrays.copyOf(buf, n)
      }
    override def write(c: Array[Char], off: Int, l: Int): Unit = {
      ensure(len + l); System.arraycopy(c, off, buf, len, l); len += l
    }
    override def write(c: Int): Unit = {
      ensure(len + 1); buf(len) = c.toChar; len += 1
    }
    override def write(s: String, off: Int, l: Int): Unit = {
      ensure(len + l); s.getChars(off, off + l, buf, len); len += l
    }
    override def flush(): Unit = ()
    override def close(): Unit = ()
    def contents: String = new String(buf, 0, len)
    def reset(): Unit = len = 0
  }

  final class Pooled(val sink: CharSink, val gen: JsonGenerator)

  private val pool = ThreadLocal.withInitial[java.util.ArrayDeque[Pooled]](
    () => new java.util.ArrayDeque[Pooled](4))

  /** A clean (sink, generator) pair; checked out of the thread's free list
    * (capture lifetimes nest LIFO, so a stack maximizes reuse). */
  def acquire(): Pooled = {
    val p = pool.get().pollLast()
    if (p != null) p
    else {
      val sink = new CharSink
      val g = JsonPathRaw.factory.createGenerator(sink)
      g.setRootValueSeparator(null) // consecutive root values, no ' ' between
      new Pooled(sink, g)
    }
  }

  /** Complete the current value: drain the generator's internal buffer to the
    * sink, take the text, reset the sink for the next capture. */
  def finish(p: Pooled): String = {
    p.gen.flush()
    val s = p.sink.contents
    p.sink.reset()
    s
  }

  /** Return a CLEANLY FINISHED pair to the thread's free list. Never call on
    * an exception path — a mid-value generator must not be reused. */
  def release(p: Pooled): Unit = pool.get().addLast(p)

  /** Capture the parser's current structure as compact raw text — the pooled
    * replacement for the `new StringWriter + createGenerator + close` idiom.
    *
    * Scalars skip the generator entirely (the dominant capture on small
    * documents): numbers/booleans/null pass their token text through, and a
    * string with no escape-needed characters re-quotes directly — byte-
    * identical to Jackson's writeString for that input (Jackson escapes only
    * `"`, `\\` and control chars by default), which the text-equality
    * consumers (RPred string compare) rely on. */
  def copyCurrent(parser: com.fasterxml.jackson.core.JsonParser): String = {
    import com.fasterxml.jackson.core.JsonToken._
    parser.currentToken() match {
      case VALUE_NUMBER_INT | VALUE_NUMBER_FLOAT => parser.getText
      case VALUE_TRUE  => "true"
      case VALUE_FALSE => "false"
      case VALUE_NULL  => "null"
      case VALUE_STRING =>
        val t = parser.getText
        var i = 0
        var plain = true
        while (plain && i < t.length) {
          val c = t.charAt(i)
          if (c == '"' || c == '\\' || c < 0x20) plain = false
          i += 1
        }
        if (plain) new java.lang.StringBuilder(t.length + 2)
          .append('"').append(t).append('"').toString
        else copyViaGenerator(parser)
      case _ => copyViaGenerator(parser)
    }
  }

  private def copyViaGenerator(parser: com.fasterxml.jackson.core.JsonParser): String = {
    val p = acquire()
    p.gen.copyCurrentStructure(parser)
    val s = finish(p)
    release(p)
    s
  }
}
