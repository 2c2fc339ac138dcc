// Dev-only microbench for the P2 postal-strip regex dialects (round-16
// verdict item 4): the r16 fidelity fix replaced `\b[0-9]{6}\b` with the
// reference's two-lookaround pattern, and q90 moved 0.52 -> 2.0 s at sf1
// inside an environment-drift band — this isolates the regex cost from
// the boot. Three candidates over address-shaped strings (CJK + digit
// runs, ~1/3 carrying a standalone 6-digit code):
//   old   \b[0-9]{6}\b           (pre-r16 — WRONG on letter-adjacent codes)
//   look  (?:(?<=[^0-9])|(?<=^))\s*[0-9]{6}\s*(?=[^0-9]|$)   (current)
//   scan  single-pass char scan, the oracle's digit-run-tokenize shape
// Usage: javac PostalBench.java && java PostalBench
public final class PostalBench {
  static String scanStrip(String s) {
    StringBuilder out = new StringBuilder(s.length());
    int i = 0, n = s.length();
    while (i < n) {
      char c = s.charAt(i);
      if (c >= '0' && c <= '9') {
        int j = i;
        while (j < n && s.charAt(j) >= '0' && s.charAt(j) <= '9') j++;
        if (j - i == 6) {
          // strip surrounding whitespace like the lookaround pattern's
          // \s* arms, emit one space in place of the run
          while (out.length() > 0
              && Character.isWhitespace(out.charAt(out.length() - 1)))
            out.setLength(out.length() - 1);
          while (j < n && Character.isWhitespace(s.charAt(j))) j++;
          out.append(' ');
        } else {
          out.append(s, i, j);
        }
        i = j;
      } else {
        out.append(c);
        i++;
      }
    }
    return out.toString().trim().replaceAll("\\s+", " ");
  }

  public static void main(String[] args) {
    java.util.regex.Pattern oldP = java.util.regex.Pattern.compile("\\b[0-9]{6}\\b");
    java.util.regex.Pattern lookP = java.util.regex.Pattern.compile(
        "(?:(?<=[^0-9])|(?<=^))\\s*[0-9]{6}\\s*(?=[^0-9]|$)");
    java.util.regex.Pattern wsP = java.util.regex.Pattern.compile("\\s+");
    // address-shaped corpus: the q90 path's per-part strings
    String[] base = {
      "大连理工大学计算机学院 辽宁大连 116024",
      "北京大学信息学院 智能系 100871 北京",
      "Xuyong646400 四川省泸州市",
      "中国科学院自动化研究所 北京市海淀区中关村东路95号",
      "清华大学 100084", "浙江大学计算机学院 杭州 310027",
      "1234567 not-a-code 12345 also-not",
      "哈尔滨工业大学 计算机科学与技术学院 黑龙江哈尔滨150001",
    };
    int N = 200000;
    String[] corpus = new String[N];
    for (int i = 0; i < N; i++) corpus[i] = base[i % base.length] + " #" + (i % 97);
    long sink = 0;
    for (int round = 0; round < 5; round++) {
      long t0 = System.nanoTime();
      for (String s : corpus)
        sink += wsP.matcher(oldP.matcher(s).replaceAll(" ")).replaceAll(" ").trim().length();
      long t1 = System.nanoTime();
      for (String s : corpus)
        sink += wsP.matcher(lookP.matcher(s).replaceAll(" ")).replaceAll(" ").trim().length();
      long t2 = System.nanoTime();
      for (String s : corpus) sink += scanStrip(s).length();
      long t3 = System.nanoTime();
      System.out.printf("round %d: old=%.3fs look=%.3fs scan=%.3fs%n",
          round, (t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9);
    }
    // semantic parity spot-check between the lookaround and the scan
    for (String s : base) {
      String a = wsP.matcher(lookP.matcher(s).replaceAll(" ")).replaceAll(" ").trim();
      String b = scanStrip(s);
      if (!a.equals(b))
        System.out.println("MISMATCH: [" + s + "] look=[" + a + "] scan=[" + b + "]");
    }
    System.out.println("sink=" + sink);
  }
}
