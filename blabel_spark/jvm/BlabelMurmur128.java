import java.nio.charset.StandardCharsets;

import org.apache.spark.sql.api.java.UDF1;
import org.sparkproject.guava.hash.Hashing;

/**
 * murmur3_128(term) as a 32-char lowercase hex digest, computed JVM-side
 * via Spark's shaded Guava — the same implementation the reference uses
 * through plain Guava (GraphLabelling.java:195 picks the hash family;
 * RunNQuadsTest.java:95 recommends murmur3_128 as the fastest).
 *
 * Registered by blabel_spark.pair_kernels as `blabel_murmur128` when the
 * companion jar is on the session classpath; the engine falls back to a
 * batch-memoized Arrow UDF otherwise.  Build: blabel_spark/jvm/build.sh.
 */
public class BlabelMurmur128 implements UDF1<String, String> {
    @Override
    public String call(String s) {
        if (s == null) {
            return null;
        }
        return Hashing.murmur3_128()
                .hashBytes(s.getBytes(StandardCharsets.UTF_8)).toString();
    }
}
