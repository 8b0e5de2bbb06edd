package graft.abi

import java.nio.charset.StandardCharsets
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Etherscan ABI fetcher over HTTPS — the production [[AbiFetcher]],
  * mirroring the reference's acquisition call (functions.py:29-31:
  * `module=contract&action=getsourcecode&address=0x…&apikey=…`, ABI
  * taken from `result[0]['ABI']`). Plugged into [[AbiCache]] it
  * completes the read-or-fetch-and-cache loop (functions.py:20-37) with
  * a real network edge; the zero-egress test suite drives it against a
  * local stub server. */
final class EtherscanFetcher(baseUrl: String, apiKey: String)
  extends AbiFetcher with Serializable {

  @transient private lazy val http = java.net.http.HttpClient.newHttpClient()

  override def fetchAbi(address: String): String = {
    val addr = if (address.startsWith("0x")) address else "0x" + address
    val uri = java.net.URI.create(
      s"$baseUrl?module=contract&action=getsourcecode&address=$addr&apikey=$apiKey")
    val resp = http.send(
      java.net.http.HttpRequest.newBuilder(uri).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"HTTP ${resp.statusCode()} from Etherscan: ${resp.body().take(200)}")
    val parsed = JsonMethods.parse(resp.body())
    (parsed \ "status") match {
      case JString("1") => ()
      case other => throw new java.io.IOException(
        s"Etherscan error status $other: ${(parsed \ "message")}")
    }
    (parsed \ "result") match {
      case JArray(first :: _) => (first \ "ABI") match {
        case JString(abi) if abi.startsWith("[") => abi
        case JString(other) => throw new java.io.IOException(
          s"no verified ABI for $addr: ${other.take(80)}")
        case _ => throw new java.io.IOException(s"malformed Etherscan result for $addr")
      }
      case _ => throw new java.io.IOException(s"empty Etherscan result for $addr")
    }
  }
}
