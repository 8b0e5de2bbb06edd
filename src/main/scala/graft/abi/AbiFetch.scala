package graft.abi

import java.nio.file.{Files, Path, Paths}

/** ABI acquisition with a local cache (reference: functions.py:20-37 —
  * `conf/<schema>/<contract>.abi` if present, else an Etherscan
  * `getabi` HTTP call whose result is written back to that path).
  *
  * The HTTP edge is a pluggable [[AbiFetcher]]: production implements it
  * with an Etherscan client; this zero-egress environment uses
  * [[MapAbiFetcher]]. Cache files are written in strict JSON — but reads
  * go through [[AbiJson.parse]], which also accepts the reference's
  * Python-repr cache dialect (functions.py:32 wrote `str(list)`), so a
  * cache directory produced by the reference is readable as-is.
  */
trait AbiFetcher {
  /** Fetch the ABI JSON text for a contract address (hex, no 0x). */
  def fetchAbi(address: String): String
}

/** Deterministic in-memory fetcher for tests/fixtures; counts calls so
  * specs can assert the cache short-circuits the network. */
final class MapAbiFetcher(abis: Map[String, String]) extends AbiFetcher {
  @volatile var calls: Int = 0
  override def fetchAbi(address: String): String = {
    calls += 1
    abis.getOrElse(address.toLowerCase,
      throw new NoSuchElementException(s"no ABI for $address"))
  }
}

final class AbiCache(cacheDir: String, fetcher: AbiFetcher) {

  private def path(schema: String, contract: String): Path =
    Paths.get(cacheDir, schema, s"$contract.abi")

  /** Parsed ABI for (schema, contract): the cached file if present, else
    * fetch by address, write-through, and parse. Mirrors the reference's
    * read-or-fetch-and-cache (functions.py:20-37) without its repr quirk
    * (we cache the fetched text verbatim; the parser handles both
    * dialects on read). */
  def abi(schema: String, contract: String, address: String): Seq[AbiJson.Entry] = {
    val p = path(schema, contract)
    if (Files.exists(p)) AbiJson.parseFile(p.toString)
    else {
      val text = fetcher.fetchAbi(address)
      val parsed = AbiJson.parse(text) // validate before caching
      Files.createDirectories(p.getParent)
      Files.writeString(p, text)
      parsed
    }
  }
}
