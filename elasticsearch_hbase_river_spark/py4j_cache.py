"""Py4J attribute-resolution caching — a process-level fix for the
dominant DataFrame-CONSTRUCTION cost (optimization guide §4: "the Python
boundary", applied to plan building instead of data movement).

Every ``F.lit`` / ``F.col`` / Column operator in classic PySpark resolves
the ``org.apache.spark.sql.functions`` class THROUGH THE GATEWAY on every
single call (``pyspark/sql/functions/builtin.py:_get_jvm_function`` and
``classic/column.py``), and each resolution is a reflection round-trip
that this sandbox serves in ~1-2 ms (measured p50 1.8 ms vs 0.07 ms for a
plain cross-process TCP echo — the cost is JVM-side classloader
reflection, not the socket). Building one staged 16-stage expression
pipeline was measured at ~10k such round-trips; across the 334-query
bench, pure plan construction was 201 s of a 464 s wall.

The fix: memoize what cannot change in a running JVM.

- ``JVMView.__getattr__``: cache name -> ``JavaClass`` per view instance.
  ONLY JavaClass results are cached: an unknown name silently resolves to
  ``JavaPackage``, and a later ``java_import`` (e.g. pyspark's streaming
  ``foreachBatch`` registers ``...streaming.sources.*`` lazily) can
  upgrade it to a class — caching a package result would freeze that
  miss. A name that has resolved to a class can never re-resolve to
  anything else (Spark never unloads these classloaders).
- ``JavaClass.__getattr__``: cache name -> static ``JavaMember`` /
  nested ``JavaClass`` per class instance. Static FIELD reads return the
  field's current VALUE and are deliberately NOT cached.

Neither cache stores data, results, or anything session-scoped: entries
are unresolved JVM handles, keyed on instances whose lifetime is the
gateway's. Nothing here changes what any query computes — it removes
repeated reflection of immutable JVM structure.
"""

from __future__ import annotations

_installed = False


def install() -> None:
    """Idempotently install the Py4J resolution caches."""
    global _installed
    if _installed:
        return
    from py4j.java_gateway import JavaClass, JavaMember, JVMView

    view_orig = JVMView.__getattr__

    def view_getattr(self, name):  # type: ignore[no-untyped-def]
        if name.startswith("_"):
            return view_orig(self, name)
        cache = self.__dict__.get("_ehrs_cls_cache")
        if cache is None:
            cache = {}
            self.__dict__["_ehrs_cls_cache"] = cache
        got = cache.get(name)
        if got is None:
            got = view_orig(self, name)
            if isinstance(got, JavaClass):
                cache[name] = got
        return got

    cls_orig = JavaClass.__getattr__

    def cls_getattr(self, name):  # type: ignore[no-untyped-def]
        if name.startswith("_"):
            return cls_orig(self, name)
        cache = self.__dict__.get("_ehrs_mem_cache")
        if cache is None:
            cache = {}
            self.__dict__["_ehrs_mem_cache"] = cache
        got = cache.get(name)
        if got is None:
            got = cls_orig(self, name)
            if isinstance(got, (JavaMember, JavaClass)):
                cache[name] = got
        return got

    JVMView.__getattr__ = view_getattr
    JavaClass.__getattr__ = cls_getattr
    _installed = True
