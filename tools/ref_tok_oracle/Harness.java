import java.io.*;
import java.nio.charset.StandardCharsets;
import java.util.Base64;
import org.apache.lucene.analysis.standard.StandardTokenizerImpl;
import org.apache.lucene.analysis.standard.UAX29URLEmailTokenizerImpl;
import org.apache.lucene.analysis.standard.StandardTokenizerInterface;

/**
 * Oracle harness: drives the reference's GENERATED jflex DFA scanners
 * (StandardTokenizerImpl / UAX29URLEmailTokenizerImpl, compiled straight
 * from /root/reference sources with constant-stub dependencies) so the
 * Python twins can be validated against the exact reference automaton.
 *
 * Test/provenance tool only -- never shipped in the Spark engine.
 *
 * Protocol (batch): each stdin line is
 *     which \t maxlen \t base64(utf8 text)
 * and each stdout line is the token list for that input:
 *     type,start,len,base64(utf8 token) joined by ';'
 * replicating StandardTokenizer.incrementToken()'s skip of tokens
 * longer than maxTokenLength (StandardTokenizer.java:180-192).
 */
public class Harness {
  /** Captures the matched chars via the getText(CharTermAttribute) hook. */
  static final class Grab implements org.apache.lucene.analysis.tokenattributes.CharTermAttribute {
    String text = "";
    public void copyBuffer(char[] buffer, int offset, int length) {
      text = new String(buffer, offset, length);
    }
  }

  public static void main(String[] args) throws Exception {
    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter out = new PrintWriter(
        new OutputStreamWriter(System.out, StandardCharsets.UTF_8));
    Base64.Decoder dec = Base64.getDecoder();
    Base64.Encoder enc = Base64.getEncoder();
    String line;
    while ((line = in.readLine()) != null) {
      if (line.isEmpty()) { out.println(); continue; }
      String[] parts = line.split("\t", 3);
      String which = parts[0];
      int maxlen = Integer.parseInt(parts[1]);
      String text = new String(dec.decode(parts[2]), StandardCharsets.UTF_8);
      StringBuilder sb = new StringBuilder();
      Grab grab = new Grab();
      int type;
      if (which.equals("wikipedia")) {
        // record format: type,start,len,posInc,b64(text) — built by the
        // same-package driver (getText/reset are package-private)
        out.println(org.apache.lucene.analysis.wikipedia.WikiOracle.scan(text, maxlen));
        continue;
      }
      StandardTokenizerInterface scanner;
      if (which.equals("standard")) {
        scanner = new StandardTokenizerImpl(new StringReader(text));
      } else {
        scanner = new UAX29URLEmailTokenizerImpl(new StringReader(text));
      }
      while ((type = scanner.getNextToken()) != StandardTokenizerInterface.YYEOF) {
        int len = scanner.yylength();
        if (len > maxlen) continue;  // StandardTokenizer skips over-long tokens
        scanner.getText(grab);
        String tok = grab.text;
        if (sb.length() > 0) sb.append(';');
        sb.append(type).append(',').append(scanner.yychar()).append(',')
          .append(len).append(',')
          .append(enc.encodeToString(tok.getBytes(StandardCharsets.UTF_8)));
      }
      out.println(sb);
    }
    out.flush();
  }
}
