package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.CatalystBridge

/** 64-bit SimHash over a token array — near-duplicate sketching where a
  * small Hamming distance between sketches implies high cosine/overlap
  * similarity of the token multisets.
  *
  * Implemented as a static JVM method invoked through Catalyst's
  * `StaticInvoke`, so it stays inside whole-stage codegen (one virtual-free
  * static call per row) rather than a Scala UDF (serialized closure +
  * catalyst<->JVM row conversion per call). The per-token hash is FNV-1a
  * 64 finished with a splitmix64 avalanche — deterministic across JVMs,
  * no dependency on Spark's internal hash functions.
  */
object SimHash {

  /** Static entry point for codegen (takes Catalyst ArrayData directly). */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = tokenHash(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private def tokenHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xCBF29CE484222325L // FNV offset basis
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL)
      h *= 0x100000001B3L // FNV prime
      i += 1
    }
    // splitmix64 avalanche for bit uniformity
    h += 0x9E3779B97F4A7C15L
    h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
    h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  /** `simhash64` as a Column over an `array<string>` column. */
  def simhash(tokens: Column): Column = CatalystBridge.column(
    StaticInvoke(
      SimHash.getClass, LongType, "simhash64",
      Seq(CatalystBridge.expression(tokens)),
      Seq(ArrayType(StringType)),
      returnNullable = false))

  /** Hamming distance between two 64-bit sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** The `b`-th 16-bit band of a sketch (for LSH-style blocking). */
  def band16(h: Column, b: Int): Column =
    shiftright(h, 16 * b).bitwiseAND(lit(0xFFFFL))
}
