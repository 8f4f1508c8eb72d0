"""Workaround for XLA persistent-cache stack overflows (infra, not math).

`LoadedExecutable.serialize()` / `deserialize_executable()` recurse
deeply on this library's ~100 MB CPU executables and overflow the
default 8 MB stack (SIGSEGV in `put_executable_and_time`, observed
2026-08-16/17).  Raising RLIMIT_STACK in-process is unreliable — the
already-mapped main stack cannot always grow past later mmaps — and
re-exec'ing breaks under pytest's fd-level output capture.

The reliable fix: run the cache read/write on a dedicated thread whose
stack is freshly mmapped at creation with a large size.  Call
`install()` once before heavy jit compiles (done by tests/conftest.py
and bench.py).
"""

from __future__ import annotations

import os
import threading

_BIG_STACK_BYTES = 2 * 1024 * 1024 * 1024
_installed = False

# Crash sentinel: a cache write that segfaults kills the whole process,
# so `put` records the module name here first and clears it on success.
# A name found in the file at startup crashed a previous run — writes
# for it are skipped permanently (reads still work; the executable is
# simply recompiled each process).
_SENTINEL = os.path.join(
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp"),
    ".serialize_crashes")


def _crashed_modules() -> set[str]:
    try:
        with open(_SENTINEL) as f:
            return {ln.strip() for ln in f if ln.strip()}
    except OSError:
        return set()


def _mark(module: str) -> None:
    try:
        with open(_SENTINEL, "a") as f:
            f.write(module + "\n")
            f.flush()
            os.fsync(f.fileno())
    except OSError:
        pass


def _unmark(module: str) -> None:
    try:
        mods = _crashed_modules()
        mods.discard(module)
        with open(_SENTINEL, "w") as f:
            f.write("".join(m + "\n" for m in mods))
    except OSError:
        pass


def _run_on_big_stack(fn, *args, **kwargs):
    out: dict = {}

    def runner():
        try:
            out["v"] = fn(*args, **kwargs)
        except BaseException as e:  # re-raised in caller
            out["e"] = e

    old = threading.stack_size(_BIG_STACK_BYTES)
    try:
        t = threading.Thread(target=runner, name="xla-cache-io")
        t.start()
        t.join()
    finally:
        threading.stack_size(old)
    if "e" in out:
        raise out["e"]
    return out.get("v")


def _probe_in_child(fn, timeout_s: float = 300.0) -> bool:
    """Run `fn` in a forked child; True iff the child exits cleanly.
    Python exceptions inside `fn` count as CLEAN (the parent will hit
    and handle the same exception) — only hard crashes (signals) and
    hangs return False."""
    import time as _time
    try:
        pid = os.fork()
    except OSError:
        return False  # cannot verify safely -> let the caller recompile
    if pid == 0:
        try:
            fn()
        except BaseException:
            pass
        os._exit(0)
    deadline = _time.time() + timeout_s
    while _time.time() < deadline:
        done, status = os.waitpid(pid, os.WNOHANG)
        if done:
            return status == 0
        _time.sleep(0.02)
    try:
        os.kill(pid, 9)
        os.waitpid(pid, 0)
    except OSError:
        pass
    return False


def install() -> None:
    """Route jax persistent-cache serialize/deserialize through a
    big-stack thread.  Idempotent; silently no-ops if jax internals
    move (the cache then just works or misses as before)."""
    global _installed
    if _installed:
        return
    _installed = True
    # sweep stale child temp dirs (crashed writers), skipping live pids
    try:
        import glob
        import re
        import shutil
        cd = os.environ.get("JAX_COMPILATION_CACHE_DIR")
        for d in glob.glob(f"{cd}.tmp*") if cd else []:
            m = re.search(r"\.tmp(\d+)$", d)
            if m:
                try:
                    os.kill(int(m.group(1)), 0)
                    continue  # writer still alive
                except OSError:
                    pass
            shutil.rmtree(d, ignore_errors=True)
    except Exception:
        pass
    # Raise RLIMIT_STACK so every pthread created AFTER this point (XLA's
    # internal compilation worker threads included) gets a large default
    # stack: the round-1/2 fatal crashes were segfaults inside
    # backend_compile_and_load even when the CALLING thread had a 2 GB
    # stack — the recursion runs on XLA's own pool threads, whose default
    # stack is RLIMIT_STACK at thread-creation time.  (The main thread's
    # already-mapped stack is unaffected; that's what the dedicated
    # big-stack thread below is for.)
    try:
        import resource
        want = 2048 << 20
        soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        cap = want if hard == resource.RLIM_INFINITY else min(want, hard)
        if soft != resource.RLIM_INFINITY and (soft < cap):
            resource.setrlimit(resource.RLIMIT_STACK, (cap, hard))
    except Exception:
        pass
    try:
        from jax._src import compilation_cache as _cc

        _orig_put = _cc.put_executable_and_time
        _orig_get = _cc.get_executable_and_time

        def put_big(cache_key, module_name, executable, backend, *a, **k):
            try:
                key = f"{getattr(backend, 'platform', '?')}:{module_name}"
            except Exception:
                key = module_name
            if key in _crashed_modules():
                return None  # serialize crashed a previous run: skip
            # XLA CPU's executable.serialize() SEGFAULTS on some of this
            # library's executables even on a 2 GB-stack thread (repro:
            # cpu:jit__verify, 2026-08-17).  Serialize + write in a
            # FORKED CHILD: the cache file still lands on disk, and a
            # crashing child cannot take the test/bench process down.
            try:
                pid = os.fork()
            except OSError:
                # fork failed (ENOMEM on a small-RAM host mid-compile is
                # the observed cause).  NEVER serialize in-process: the
                # segfault then kills the whole pytest/bench run (parent
                # died rc=139, 2026-08-20).  The cache entry is an
                # optimization — skip it and retry on a later call.
                return None
            if pid == 0:
                # child: write the cache entry into a PRIVATE temp dir,
                # then atomically rename finished files into the real
                # cache.  A child that segfaults mid-serialize (the
                # known XLA:CPU bug) must not leave a TRUNCATED entry in
                # the shared dir — a later load of a torn entry aborted
                # the whole pytest parent (observed 2026-08-20, rc=134).
                try:
                    import shutil as _shutil
                    real = os.environ.get("JAX_COMPILATION_CACHE_DIR")
                    tmp = f"{real}.tmp{os.getpid()}" if real else None
                    if tmp:
                        os.makedirs(tmp, exist_ok=True)
                        from jax._src import config as _jcfg
                        from jax._src import compilation_cache as _cc2
                        _cc2.reset_cache()
                        _jcfg.config.update("jax_compilation_cache_dir", tmp)
                    _run_on_big_stack(_orig_put, cache_key, module_name,
                                      executable, backend, *a, **k)
                    if tmp:
                        for f in os.listdir(tmp):
                            os.replace(os.path.join(tmp, f),
                                       os.path.join(real, f))
                        _shutil.rmtree(tmp, ignore_errors=True)
                    os._exit(0)
                except BaseException:
                    os._exit(1)
            # parent: reap with a timeout; a wedged/crashed child is
            # killed and the module marked so we stop re-trying it
            import time as _time
            deadline = _time.time() + 300
            while _time.time() < deadline:
                done, status = os.waitpid(pid, os.WNOHANG)
                if done:
                    if status != 0:
                        _mark(key)
                    return None
                _time.sleep(0.05)
            try:
                os.kill(pid, 9)
                os.waitpid(pid, 0)
            except OSError:
                pass
            _mark(key)
            return None

        def get_big(*a, **k):
            try:
                return _run_on_big_stack(_orig_get, *a, **k)
            except Exception:
                # torn/corrupt entry (e.g. a crashed writer on an older
                # tree) -> treat as a cache miss, never take the run down
                return None, None

        _cc.put_executable_and_time = put_big
        _cc.get_executable_and_time = get_big
        # compiler.py binds the names via module attribute lookups, so
        # patching the compilation_cache module is sufficient.
    except Exception:
        pass
    # DESERIALIZATION of some of this library's big XLA:CPU executables
    # ALSO segfaults (round-5 root cause of the r1..r4 suite crash:
    # faulthandler showed get_executable_and_time -> SIGSEGV while
    # loading the cached jit__verify_lhs entry; the same test PASSED
    # whenever the entry was absent, because then it merely compiled).
    # A cache read is therefore probed in a FORKED CHILD first: if the
    # child dies, the module is sentinel-marked (no reads, no writes —
    # the program is recompiled per process) and the parent treats the
    # lookup as a miss.  Probe cost is one extra deserialize for healthy
    # entries, CPU platform only.
    try:
        from jax._src import compiler as _compiler

        _orig_read = _compiler._cache_read
        # Fork cost scales with the parent's page tables (a warm pytest
        # process is gigabytes), so probing EVERY read stalls the many
        # tiny eager-op lookups; every observed (de)serialize crasher
        # was a multi-MB entry, so only those pay the probe.
        _PROBE_MIN_BYTES = 1 << 20

        def _entry_size(backend, cache_key):
            try:
                cache = _cc._get_cache(backend)
                if cache is None:
                    return None
                blob = cache.get(cache_key)
                return None if blob is None else len(blob)
            except Exception:
                return None

        def cache_read_safe(module_name, cache_key, compile_options,
                            backend, executable_devices):
            plat = getattr(backend, "platform", "?")
            key = f"{plat}:{module_name}"
            if key in _crashed_modules():
                return None, None
            if plat == "cpu":
                size = _entry_size(backend, cache_key)
                if size is None:
                    return None, None  # miss: skip the deserialize path
                if size >= _PROBE_MIN_BYTES and not _probe_in_child(
                        lambda: _orig_read(module_name, cache_key,
                                           compile_options, backend,
                                           executable_devices)):
                    _mark(key)
                    return None, None
            try:
                return _run_on_big_stack(_orig_read, module_name, cache_key,
                                         compile_options, backend,
                                         executable_devices)
            except Exception:
                return None, None

        _compiler._cache_read = cache_read_safe
    except Exception:
        pass
    # The XLA compile itself also recurses deeply on this library's big
    # modules and can overflow the 8 MB MAIN-thread stack (round-1 crash
    # was a fatal signal in `compile_or_get_cached`, main thread).  Route
    # the backend compile calls through the big-stack thread as well.
    try:
        from jax._src import compiler as _compiler

        for _name in ("backend_compile", "backend_compile_and_load"):
            _orig = getattr(_compiler, _name, None)
            if _orig is None:
                continue

            def _make(fn):
                def compile_big(*a, **k):
                    return _run_on_big_stack(fn, *a, **k)
                return compile_big

            setattr(_compiler, _name, _make(_orig))
    except Exception:
        pass


def _host_cpu_flags() -> set[str]:
    try:
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if ln.startswith("flags"):
                    return set(ln.split(":", 1)[1].split())
    except OSError:
        pass
    return set()


def seed(repo_dir: str | None = None) -> int:
    """Copy committed XLA-cache entries (.jax_cache_seed/, tracked in
    git) into the working cache dir so a FRESH CLONE skips the cold
    compiles that blew the round-1 driver budget (.jax_cache itself is
    gitignored).  Returns the number of entries copied.  Idempotent and
    cheap: existing files are never overwritten.

    Safety gating (round-3, ADVICE r2): entries are only trusted when
    the committed MANIFEST.json validates against this host —

    * no manifest, or a jaxlib version mismatch -> copy NOTHING (the
      cache key embeds the version, so stale entries are dead weight;
      unmanifested blobs are unreviewable native code).
    * CPU-backend entries additionally require the compile host's CPU
      feature set (recorded at seed-build time) to be a SUBSET of this
      host's /proc/cpuinfo flags: XLA:CPU AOT executables built with
      e.g. AMX/AVX-512 SIGILL on a leaner host (MULTICHIP_r02 warning
      wall).  TPU-backend entries run on the chip, not the host CPU,
      and are gated on the jaxlib match only.

    TPUKZG_SEED_CACHE=0 disables seeding entirely.
    """
    import json
    import shutil

    if os.environ.get("TPUKZG_SEED_CACHE", "1") == "0":
        return 0
    if repo_dir is None:
        repo_dir = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))
    src = os.path.join(repo_dir, ".jax_cache_seed")
    dst = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                         os.path.join(repo_dir, ".jax_cache"))
    if not os.path.isdir(src) or os.path.abspath(src) == os.path.abspath(dst):
        return 0
    try:
        with open(os.path.join(src, "MANIFEST.json")) as f:
            manifest = json.load(f)
    except (OSError, ValueError):
        return 0  # unmanifested seed: do not trust it
    try:
        import jaxlib.version
        if manifest.get("jaxlib") != jaxlib.version.__version__:
            return 0
    except Exception:
        return 0
    cpu_ok = set(manifest.get("cpu_features", [])) <= _host_cpu_flags()
    entries = manifest.get("entries", {})
    os.makedirs(dst, exist_ok=True)
    n = 0
    for name, backend in entries.items():
        if backend == "cpu" and not cpu_ok:
            continue
        d = os.path.join(dst, name)
        if not os.path.exists(d):
            try:
                shutil.copy2(os.path.join(src, name), d)
                n += 1
            except OSError:
                pass
    return n
