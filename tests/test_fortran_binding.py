"""Static contract check of the Fortran binding against the C header.

The CI image has no Fortran compiler (the fortran-binding CI job installs
gfortran and runs capi/f_binding_test); this test keeps the iso_c_binding
interface surface honest *locally*: every C API function must have a
bind(c) interface with matching argument count AND per-argument
kinds/classes (a wrong c_int vs c_size_t kind, or a missing ``value``
attribute, would link fine and corrupt the call frame at run time - the
exact failure class a never-compiled binding can hide).  Drift between
graph_c_binding.h and graph_fortran_binding.f90 fails the suite instead
of failing a downstream Fortran embedder.
"""

import pathlib
import re

CAPI = pathlib.Path(__file__).resolve().parent.parent / "capi"

# scalar C type -> canonical class
_C_SCALAR = {"size_t": "size_t", "int": "int", "double": "double",
             "float": "float", "bool": "bool", "_Bool": "bool",
             "void": "void", "int32_t": "int32", "uint32_t": "uint32"}


def _classify_c_arg(arg):
    """Canonical class of one C argument declaration."""
    a = re.sub(r"\b(const|STRUCT_TAG|struct|enum)\b", " ", arg)
    stars = a.count("*") + a.count("[")
    toks = re.sub(r"[*\[\]]", " ", a).split()
    base = toks[0] if toks else "void"
    if base == "graph_node":
        # typedef void*: one star on top of it is an array of handles
        return "ptr_arr" if stars else "ptr:void"
    if base == "graph_type":
        return "int"
    if stars >= 2:
        return "ptr_arr"
    if stars == 1:
        return "charp" if base == "char" else f"ptr:{base}"
    return _C_SCALAR.get(base, f"?{base}")


def _c_prototypes():
    """{symbol: (ret_class, [arg_class, ...])} for every graph_* function."""
    text = (CAPI / "graph_c_binding.h").read_text()
    # strip comments and preprocessor lines
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"^\s*#.*$", " ", text, flags=re.M)
    out = {}
    for m in re.finditer(
            r"([A-Za-z_][A-Za-z0-9_ *]*?)\s*\b(graph_[a-zA-Z0-9_]+)"
            r"\s*\(([^;{]*)\)\s*;", text, re.S):
        ret, name, args = m.group(1), m.group(2), m.group(3)
        args = args.strip()
        arg_classes = [] if args in ("", "void") else [
            _classify_c_arg(a) for a in args.split(",")]
        out[name] = (_classify_c_arg(ret + " _r"), arg_classes)
    return out


# Fortran declaration type-spec -> (class scalar, class array)
_F_TYPES = {
    r"type\s*\(\s*c_ptr\s*\)": ("ptr", "ptr_arr"),
    r"integer\s*\(\s*c_int\s*\)": ("int", "arr:int"),
    r"integer\s*\(\s*c_size_t\s*\)": ("size_t", "arr:size_t"),
    r"real\s*\(\s*c_double\s*\)": ("double", "arr:double"),
    r"real\s*\(\s*c_float\s*\)": ("float", "arr:float"),
    r"logical\s*\(\s*c_bool\s*\)": ("bool", "arr:bool"),
    r"integer\s*\(\s*c_int32_t\s*\)": ("int32", "arr:int32"),
    r"character\s*\(\s*kind\s*=\s*c_char\s*\)": ("char", "charp"),
}


def _f_interfaces():
    """{c_symbol: (ret_class, [(arg_class, has_value), ...])} for every
    bind(c) interface in the module."""
    raw = (CAPI / "graph_fortran_binding.f90").read_text()
    # strip comments, join continuation lines
    lines = []
    for line in raw.splitlines():
        line = line.split("!", 1)[0].rstrip()
        if lines and lines[-1].endswith("&"):
            lines[-1] = lines[-1][:-1] + line.lstrip().lstrip("&")
        else:
            lines.append(line)
    text = "\n".join(lines)
    out = {}
    for m in re.finditer(
            r"(function|subroutine)\s+([a-z0-9_]+)\s*\(([^)]*)\)\s*"
            r"bind\s*\(\s*c\s*,\s*name\s*=\s*\"(graph_[a-zA-Z0-9_]+)\""
            r"\s*\)(.*?)end\s+(?:function|subroutine)",
            text, re.I | re.S):
        kind, fname, args, cname, body = m.groups()
        argnames = [a.strip().lower() for a in args.split(",") if a.strip()]
        decls = {}                 # declared name -> (class, has_value)
        for line in body.splitlines():
            dm = re.match(r"\s*(.+?)\s*::\s*(.+)$", line)
            if not dm:
                continue
            spec, names = dm.groups()
            has_value = re.search(r"\bvalue\b", spec, re.I) is not None
            is_array = re.search(r"dimension\s*\(\s*\*\s*\)", spec,
                                 re.I) is not None
            cls = None
            for pat, (scalar, array) in _F_TYPES.items():
                if re.match(r"\s*" + pat, spec, re.I):
                    cls = array if is_array else scalar
                    break
            for nm in names.split(","):
                decls[nm.strip().lower()] = (cls, has_value)
        ret = "void" if kind.lower() == "subroutine" else \
            decls.get(fname.lower(), (None, False))[0]
        out[cname] = (ret, [decls.get(a, (None, False)) for a in argnames])
    return out


def _compatible(c_cls, f_cls, f_value):
    """Is the Fortran (class, value-attr) a valid binding of the C class?"""
    if c_cls == "uint32":
        # Fortran has no unsigned kinds; c_int32_t is the standard
        # same-size companion of uint32_t
        return f_cls == "int32" and f_value
    if c_cls in ("size_t", "int", "int32", "double", "float", "bool"):
        return f_cls == c_cls and f_value      # scalars: exact kind, by value
    if c_cls == "charp":
        return (f_cls == "charp" and not f_value) or \
            (f_cls == "ptr" and f_value)
    if c_cls == "ptr_arr":
        # array of handles: assumed-size c_ptr array (by reference) or a
        # c_ptr holding the array address
        return (f_cls == "ptr_arr" and not f_value) or \
            (f_cls == "ptr" and f_value)
    if c_cls.startswith("ptr:"):
        pointee = c_cls.split(":", 1)[1]
        if f_cls == "ptr" and f_value:
            return True                        # opaque handle / address
        # typed assumed-size array passes the same address by reference
        return f_cls == f"arr:{pointee}" and not f_value
    return False


def test_every_c_function_has_fortran_interface():
    c = _c_prototypes()
    f = _f_interfaces()
    missing = sorted(set(c) - set(f))
    assert not missing, f"C functions without Fortran interface: {missing}"


def test_no_phantom_fortran_interfaces():
    c = _c_prototypes()
    f = _f_interfaces()
    phantom = sorted(set(f) - set(c))
    assert not phantom, f"Fortran interfaces without C prototype: {phantom}"


def test_argument_counts_match():
    c = _c_prototypes()
    f = _f_interfaces()
    bad = {n: (len(c[n][1]), len(f[n][1])) for n in set(c) & set(f)
           if len(c[n][1]) != len(f[n][1])}
    assert not bad, f"arg-count mismatches (C, Fortran): {bad}"


def test_argument_kinds_match():
    """Kind-level parity: every argument's iso_c_binding kind + value
    attribute must be a valid binding of the C declaration (c_int vs
    c_size_t, missing VALUE, array-ness)."""
    c = _c_prototypes()
    f = _f_interfaces()
    bad = []
    for name in sorted(set(c) & set(f)):
        for i, (cc, (fc, fv)) in enumerate(zip(c[name][1], f[name][1])):
            if not _compatible(cc, fc, fv):
                bad.append(f"{name} arg{i}: C {cc!r} vs "
                           f"Fortran {fc!r} value={fv}")
    assert not bad, "kind mismatches:\n" + "\n".join(bad)


def test_return_kinds_match():
    c = _c_prototypes()
    f = _f_interfaces()
    ok_ret = {"void": {"void"}, "size_t": {"size_t"}, "int": {"int"},
              "double": {"double"}, "float": {"float"}, "bool": {"bool"}}
    bad = []
    for name in sorted(set(c) & set(f)):
        cr, fr = c[name][0], f[name][0]
        if cr.startswith("ptr") or cr == "charp":
            if fr != "ptr":
                bad.append(f"{name}: C returns {cr!r}, Fortran {fr!r}")
        elif fr not in ok_ret.get(cr, set()):
            bad.append(f"{name}: C returns {cr!r}, Fortran {fr!r}")
    assert not bad, "return-kind mismatches:\n" + "\n".join(bad)


def test_fortran_test_program_covers_core_api():
    """The f_binding_test program exercises the core round-trip surface."""
    text = (CAPI / "f_binding_test.f90").read_text()
    for sym in ("graph_construct_context", "graph_variable",
                "graph_set_variable", "graph_df", "graph_add_item",
                "graph_add_converge_item", "graph_compile", "graph_run",
                "graph_copy_to_host", "graph_piecewise_1d",
                "graph_destroy_context"):
        assert sym in text, f"f_binding_test does not exercise {sym}"
