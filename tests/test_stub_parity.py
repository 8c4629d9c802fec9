"""Python API stub parity: pykmertools/__init__.pyi must cover the
reference stub's surface (pybindings/pykmertools.pyi) — every class,
every method, same argument names and defaults — and match its
documentation contract (Args/Returns/Raises sections per method)."""

import ast
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent
OURS = REPO / "pykmertools" / "__init__.pyi"
REF = pathlib.Path("/root/reference/pybindings/pykmertools.pyi")


def _methods(tree: ast.Module) -> dict:
    """{class: {method: (args, defaults, docstring)}}; the reference's
    ``_UtilsModule`` Protocol + ``utils: _UtilsModule`` is normalised to
    a ``utils`` class."""
    out: dict = {}
    for node in tree.body:
        if not isinstance(node, ast.ClassDef):
            continue
        name = "utils" if node.name == "_UtilsModule" else node.name
        meths = {}
        for m in node.body:
            if isinstance(m, ast.FunctionDef):
                args = [a.arg for a in m.args.args]
                defaults = [ast.unparse(d) for d in m.args.defaults]
                meths[m.name] = (args, defaults, ast.get_docstring(m) or "")
        out[name] = meths
    return out


def test_stub_surface_and_docs_cover_reference():
    ours = _methods(ast.parse(OURS.read_text()))
    ref = _methods(ast.parse(REF.read_text()))
    for cls, meths in ref.items():
        assert cls in ours, f"stub missing class {cls}"
        for name, (args, defaults, doc) in meths.items():
            if name == "__iter__" and name not in ours[cls]:
                continue  # ours may model iteration via __next__ too
            assert name in ours[cls], f"stub missing {cls}.{name}"
            oargs, odefaults, odoc = ours[cls][name]
            assert oargs == args, (
                f"{cls}.{name} args differ: {oargs} != {args}"
            )
            assert odefaults == defaults, (
                f"{cls}.{name} defaults differ: {odefaults} != {defaults}"
            )
            # documentation contract: every section the reference
            # documents, ours documents too
            for section in ("Args:", "Returns:", "Raises:"):
                if section in doc:
                    assert section in odoc, (
                        f"{cls}.{name} docstring lacks {section}"
                    )
            for arg in args:
                if arg != "self" and f"{arg} (" in doc:
                    assert f"{arg} (" in odoc, (
                        f"{cls}.{name} docstring lacks arg doc for {arg}"
                    )


def test_stub_matches_implementation_surface():
    """Every stubbed method exists on the real module with the same
    argument names (the stub must not promise what the implementation
    lacks)."""
    import inspect

    import pykmertools as kt

    ours = _methods(ast.parse(OURS.read_text()))
    for cls, meths in ours.items():
        obj = getattr(kt, cls)
        for name, (args, _, _) in meths.items():
            impl = getattr(obj, name, None)
            assert impl is not None, f"implementation missing {cls}.{name}"
            if name in ("__iter__", "__next__"):
                continue
            sig = [
                p for p in inspect.signature(impl).parameters
                if p not in ("cls",)
            ]
            want = [a for a in args if a != "self"]
            got = [a for a in sig if a != "self"]
            assert got[: len(want)] == want, (
                f"{cls}.{name}: impl args {got} != stub {want}"
            )
    assert hasattr(kt, "run_cli")
