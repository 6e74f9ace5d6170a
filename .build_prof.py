import cProfile, pstats, io, time, sys, importlib.util
sys.argv = ["x"]
import learnedmetricindex_tpu as lmi
lmi.enable_compilation_cache()
spec = importlib.util.spec_from_file_location("benchmod", "/root/repo/bench.py")
B = importlib.util.module_from_spec(spec); spec.loader.exec_module(B)
gen = B.RowGenerator(256, 768, 2023, 0.45)
values, scales = gen.fill_corpus_int8(2_000_000)
print("corpus ready", flush=True)
cfg = lmi.BuildConfiguration(["kmeans"]*2, [4]*2, ["MLP-4"]*2, [0.01]*2, [10, 10],
                             seed=2023, batch_size=1024, dtype="bfloat16")
t0 = time.perf_counter()
pr = cProfile.Profile(); pr.enable()
index, pred, nb, build_t, cluster_t = lmi.LearnedIndexBuilder((values, scales), cfg).build()
pr.disable()
print(f"build {build_t:.1f}s cluster {cluster_t:.1f}s")
s = io.StringIO(); pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(26)
for line in s.getvalue().splitlines()[:42]:
    print(line)
