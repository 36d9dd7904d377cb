// JVM allocation-churn scaling control (hardware/runtime ceiling #4).
//
// The campaign's existing controls (pure-ALU burn, streaming membw,
// random-access) are Python-process workloads; none reproduces the
// dominant memory traffic of a Spark local[N] JVM running interpreted
// Catalyst expressions: high-rate small-object allocation with a
// short-lived-but-GC-visible live set, i.e. allocator + minor-GC
// pressure on the shared DRAM bus. This control measures how THAT
// access pattern scales from 1 to N threads inside one JVM under the
// exact pinned-proxy regime the engine workers use
// (taskset 0..N-1, -XX:ActiveProcessorCount=N, G1, heap 2+4N g).
//
// Per "op", each thread allocates a handful of small double[] arrays
// (the size class of interpreted HOF ring/vertex intermediates), folds
// over them (shoelace-style multiply-adds), and retains a sliding
// window of survivors so a fraction of allocations live past a minor
// collection. Ops/sec at N threads vs 1 thread, same wall budget.
//
// Usage: java JvmAllocControl <threads> <seconds> [live_bits]
// (caller pins the process and sets -XX:ActiveProcessorCount)
// live_bits sizes the per-thread survivor ring: 16 -> ~25 MB/thread
// (fast-churn regime), 19 -> ~200 MB/thread (executor-realistic
// minor-GC copy pressure).
public final class JvmAllocControl {
    static final int ARR = 48;        // doubles per array (~400 B, HOF-ish)
    static final int ALLOCS_PER_OP = 6;
    static int LIVE_BITS = 16;        // 64k survivors/thread (~25 MB live)

    public static void main(String[] args) throws Exception {
        final int threads = Integer.parseInt(args[0]);
        final double seconds = Double.parseDouble(args[1]);
        if (args.length > 2) LIVE_BITS = Integer.parseInt(args[2]);
        // warmup: let JIT + GC reach steady state before timing
        runFor(threads, Math.min(5.0, seconds / 2));
        long ops = runFor(threads, seconds);
        System.out.println("{\"threads\": " + threads
                + ", \"seconds\": " + seconds
                + ", \"ops\": " + ops
                + ", \"ops_per_sec\": " + Math.round(ops / seconds) + "}");
    }

    static long runFor(int threads, double seconds) throws Exception {
        final long deadline = System.nanoTime() + (long) (seconds * 1e9);
        final long[] counts = new long[threads * 16]; // pad: no false share
        Thread[] ts = new Thread[threads];
        for (int t = 0; t < threads; t++) {
            final int id = t;
            ts[t] = new Thread(() -> {
                double[][] live = new double[1 << LIVE_BITS][];
                long n = 0;
                double sink = id;
                while (System.nanoTime() < deadline) {
                    for (int burst = 0; burst < 256; burst++) {
                        double acc = 0;
                        for (int a = 0; a < ALLOCS_PER_OP; a++) {
                            double[] arr = new double[ARR];
                            for (int i = 0; i < ARR; i++) {
                                arr[i] = sink + i * 1.000000119e0;
                            }
                            // shoelace-style fold over the fresh array
                            for (int i = 0; i < ARR - 2; i += 2) {
                                acc += arr[i] * arr[i + 3]
                                        - arr[i + 2] * arr[i + 1];
                            }
                            // a fraction of allocations survive: store
                            // into the ring so minor GC sees live data
                            if ((n & 3) == 0) {
                                live[(int) (n >>> 2)
                                        & ((1 << LIVE_BITS) - 1)] = arr;
                            }
                            n++;
                        }
                        sink = acc * 1e-9;
                    }
                    counts[id * 16] += 256;
                }
                // defeat dead-code elimination
                if (sink == Double.MIN_VALUE) System.err.println(sink);
            });
            ts[t].start();
        }
        long total = 0;
        for (Thread th : ts) th.join();
        for (int t = 0; t < threads; t++) total += counts[t * 16];
        return total * ALLOCS_PER_OP;
    }
}
