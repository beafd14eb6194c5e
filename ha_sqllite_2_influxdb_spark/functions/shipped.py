"""By-value shipping for executor closures (the hermetic-worker rule).

cloudpickle serializes a MODULE-LEVEL function as an import reference,
so any mapInPandas / applyInPandas / pandas_udf closure that calls one
would require this package on every executor's PYTHONPATH. Operators
that want to stay runnable on workers without the package installed
(the multimodal codec convention, extended package-wide in r11 after
the non-repo-cwd audit caught the ADPCM and forecast tiers) rebind the
helper through `_shipped` at plan-build time and capture the result as
a closure local.

Originally `operators/multimodal._shipped` (r9-r10); extracted here in
r11 so non-codec operators share it without importing the 4k-line
codec module. `multimodal._shipped` stays as an alias — tests and
docstrings reference it by that name.
"""

from __future__ import annotations


def _shipped(f):
    """Return a by-value copy of a module-level helper.

    Rebinding the code object to a fresh function that module lookup
    does NOT resolve to (``getattr(module, qualname) is not f``) makes
    cloudpickle serialize the CODE by value. Safe only for helpers that
    are self-contained (local imports + builtins, no module-global
    reads) — enforced STRUCTURALLY (VERDICT r9 #7): any non-builtin
    global load in the helper (or a code object nested in it) raises
    ValueError HERE, at decoration time on the driver, instead of
    NameError mid-batch on a cluster. Local ``import x`` is fine:
    IMPORT_NAME goes through builtins' ``__import__`` and binds a
    local, never reading module globals. Module-level CONSTANTS a
    helper needs must ride as defaulted parameters (the `_ima_step`
    pattern) — `__defaults__` is copied by value below."""
    import builtins
    import dis
    import types

    def _global_loads(code):
        names = {i.argval for i in dis.get_instructions(code)
                 if i.opname in ("LOAD_GLOBAL", "LOAD_NAME")}
        for const in code.co_consts:
            if isinstance(const, types.CodeType):
                names |= _global_loads(const)
        return names

    offenders = sorted(n for n in _global_loads(f.__code__)
                       if not hasattr(builtins, n))
    if offenders:
        # a real raise, not assert: python -O would strip an assert and
        # silently restore the mid-batch executor NameError this gate
        # exists to prevent
        raise ValueError(
            f"_shipped({f.__qualname__}): non-builtin global loads would "
            f"NameError on executors under by-value shipping: {offenders} "
            f"— make the helper self-contained (local imports, no module "
            f"globals) or pass the dependency as an argument")

    g = types.FunctionType(f.__code__, {"__builtins__": __builtins__},
                           f.__name__, f.__defaults__, f.__closure__)
    g.__qualname__ = f.__qualname__
    return g
