package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature over a shingle set in ONE pass (SURVEY.md §2k X2).
  *
  * Semantics (shared bit-for-bit with the DuckDB oracle): hash function
  * h of `numHashes` is the 8-hex-char chunk h%4 of md5(shingle + '#' +
  * h/4); the signature entry is the lexicographic minimum of that chunk
  * over the shingle set.
  *
  * Why native: Spark's higher-order functions evaluate their lambdas
  * interpreted, per element, per function — the HOF formulation walks
  * the shingle array `numHashes` times computing `numHashes` full md5
  * digests per shingle. This expression walks the array once, computes
  * `numHashes/4` digests per shingle (each md5 yields four 32-bit
  * chunks, ample for a min over a shingle set), and keeps all mins in
  * one register array: ~16× less hashing, one pass. `CodegenFallback`
  * is deliberate — the HOF version it replaces is interpreted anyway,
  * and the win is algorithmic, not codegen.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(numHashes > 0 && numHashes % 4 == 0, "numHashes must be a positive multiple of 4")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_signature"

  @transient private lazy val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: MessageDigest, bytes: Array[Byte]): Array[Char] = {
    val digest = md.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((digest(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(digest(i) & 0xf)
      i += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val n = shingles.numElements()
    val seeds = numHashes / 4
    val mins = new Array[String](numHashes)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        var k = 0
        while (k < seeds) {
          val salted = (s.toString + "#" + k).getBytes("UTF-8")
          val hex = md5Hex(md, salted)
          var j = 0
          while (j < 4) {
            val chunk = new String(hex, 8 * j, 8)
            val h = 4 * k + j
            if (mins(h) == null || chunk < mins(h)) mins(h) = chunk
            j += 1
          }
          k += 1
        }
      }
      i += 1
    }
    // empty/all-null shingle set → nulls would violate containsNull;
    // emit the max chunk so such docs never collide on any band
    val out = mins.map(m => UTF8String.fromString(if (m == null) "ffffffff" else m))
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
