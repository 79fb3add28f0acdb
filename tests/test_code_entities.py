"""E1–E4/E7/E8, M6, P14 — entity extraction + snippet references."""

from kgcompass_spark.functions.code_entities import (
    extract_code_blocks,
    extract_entities,
    extract_snippet_refs,
    import_alias_map,
    parse_python_entities,
    snippet_references,
)

SRC = '''"""Module doc."""
import os
from collections import OrderedDict as OD

MAX_SIZE = 10
COMPLEX = some_call()

class Widget:
    """A widget."""

    def render(self, target):
        """Render it."""
        return target

    async def flush(self):
        pass

def helper(x, *args, **kw):
    return x
'''


def test_parse_python_entities():
    rows = parse_python_entities("pkg/mod.py", SRC)
    by_name = {r["name"]: r for r in rows}
    assert by_name["pkg.mod.Widget"]["kind"] == "class"
    assert by_name["pkg.mod.Widget"]["doc_string"] == "A widget."
    assert by_name["pkg.mod.Widget.render"]["signature"] == "render(self, target)"
    assert by_name["pkg.mod.Widget.flush"]["kind"] == "method"
    assert by_name["pkg.mod.helper"]["signature"] == "helper(x, *args, **kw)"
    assert by_name["pkg.mod.MAX_SIZE"]["signature"] == "MAX_SIZE = 10"
    assert by_name["pkg.mod.COMPLEX"]["signature"] == "COMPLEX = <expr>"
    w = by_name["pkg.mod.Widget"]
    assert w["start_line"] > 0 and w["end_line"] > w["start_line"]


def test_parse_python2_rescue():
    rows = parse_python_entities("old.py", "def f():\n    print 'hi'\n")
    assert any(r["name"] == "old.f" for r in rows)


def test_parse_python2_rescue_neq_and_haskey():
    """E8 full battery: `<>` comparisons and `.has_key()` calls rescue too."""
    src = (
        "def g(d, x):\n"
        "    if x <> 0 and d.has_key(x):\n"
        "        print 'yes'\n"
        "        return d[x]\n"
        "    return None\n"
    )
    rows = parse_python_entities("legacy.py", src)
    assert any(r["name"] == "legacy.g" for r in rows)


def test_parse_garbage_returns_empty():
    assert parse_python_entities("x.py", "def def def (((") == []


def test_import_alias_map():
    m = import_alias_map(SRC)
    assert m["os"] == "os"
    assert m["OD"] == "collections.OrderedDict"


def test_extract_code_blocks():
    text = "intro\n```python\na = 1\nb = 2\n```\nmiddle\n```\nc\n```\n"
    assert extract_code_blocks(text) == ["a = 1\nb = 2", "c"]


def test_snippet_references():
    snippet = "import numpy as np\nfrom pkg.mod import Widget\nnp.zeros(3)\nWidget()\n"
    refs = snippet_references(snippet)
    assert ("import", "numpy") in refs
    assert ("import", "pkg.mod.Widget") in refs
    assert ("call", "numpy.zeros") in refs
    assert ("call", "pkg.mod.Widget") in refs


def test_extract_entities_spark(spark):
    files = spark.createDataFrame(
        [("pkg/mod.py", SRC), ("bad.py", "((("), ("empty.py", "")],
        "file_path string, source string",
    )
    rows = extract_entities(files).collect()
    names = {r["name"] for r in rows}
    assert "pkg.mod.Widget.render" in names
    assert all(r["file_path"] == "pkg/mod.py" for r in rows)  # bad/empty → no rows


def test_extract_snippet_refs_spark(spark):
    pages = spark.createDataFrame(
        [("u1", "text\n```python\nimport json\njson.dumps({})\n```\n")],
        "url string, clean_text string",
    )
    refs = {(r["ref_type"], r["ref_name"]) for r in extract_snippet_refs(pages).collect()}
    assert ("import", "json") in refs
    assert ("call", "json.dumps") in refs


def test_parse_java_entities():
    """E5: classes/interfaces + methods with package-qualified names and
    brace-matched spans (reference language_factory.py:212-231 fidelity)."""
    java = (
        "package com.example.engine;\n\n"
        "public class Scheduler {\n"
        "    public void runCycle(int ticks) throws Exception {\n"
        "        for (int i = 0; i < ticks; i++) { tick(i); }\n"
        "    }\n"
        "}\n\n"
        "interface Runner {\n    void start();\n}\n"
    )
    from kgcompass_spark.functions.code_entities import parse_java_entities

    rows = {r["name"]: r for r in parse_java_entities("com/example/engine/Scheduler.java", java)}
    assert rows["com.example.engine.Scheduler"]["kind"] == "class"
    assert rows["com.example.engine.Runner"]["kind"] == "class"
    m = rows["com.example.engine.Scheduler.runCycle"]
    assert m["kind"] == "method"
    # javalang-shaped: qualified prefix + typed params + return type
    assert m["signature"] == "com.example.engine.Scheduler.runCycle(int ticks): void"
    assert m["start_line"] == 4 and m["end_line"] == 6
    # the for-loop header must NOT become a method
    assert not any(r["short_name"] == "for" for r in rows.values())


def test_parse_cpp_entities():
    from kgcompass_spark.functions.code_entities import parse_cpp_entities

    cpp = (
        "class TokenStream {\n"
        "public:\n"
        "    int emitToken(int id) {\n"
        "        return id + 1;\n"
        "    }\n"
        "};\n\n"
        "int freeHelper(int v) {\n"
        "    return v * 2;\n"
        "}\n"
    )
    rows = {r["short_name"]: r for r in parse_cpp_entities("engine/token_stream.cpp", cpp)}
    assert rows["TokenStream"]["kind"] == "class"
    assert rows["emitToken"]["name"] == "engine.token_stream.TokenStream.emitToken"
    assert rows["freeHelper"]["kind"] == "method"
    assert not any(k in rows for k in ("if", "for", "while", "return"))


def test_inventory_from_mixed_language_sources(spark):
    """Language dispatch: one inventory from .py + .java + .cpp files."""
    from kgcompass_spark.functions.code_entities import inventory_from_sources

    files = spark.createDataFrame(
        [
            ("pkg/mod.py", "class A:\n    def run(self):\n        return 1\n"),
            ("com/ex/B.java", "package com.ex;\npublic class B {\n    public int go() {\n        return 2;\n    }\n}\n"),
            ("core/c.cpp", "struct C {\n    int f(int x) {\n        return x;\n    }\n};\n"),
        ],
        "file_path string, source string",
    )
    ents = {r["entity_id"] for r in inventory_from_sources(files).collect()}
    assert "class:pkg.mod.A@pkg/mod.py" in ents
    assert "class:com.ex.B@com/ex/B.java" in ents
    assert "method:com.ex.B.go@com/ex/B.java" in ents
    assert "class:core.c.C@core/c.cpp" in ents
    assert "file:com/ex/B.java" in ents


def test_java_nested_types_constructors_javadoc():
    """E5 structural fidelity (javalang-extractor observables,
    language_factory.py:805-1010): nested Outer.Inner qualification,
    constructors emitted under the class name, javadoc doc_strings,
    interface default methods, throws-clause methods."""
    from kgcompass_spark.functions.code_entities import parse_java_entities

    src = (
        "package com.acme.app;\n\n"
        "/** Outer widget container. */\n"
        "public class Outer {\n"
        "    /** Builds an Outer. */\n"
        "    public Outer(int size) {\n"
        "        this.size = size;\n"
        "    }\n\n"
        "    /** Inner helper. */\n"
        "    public static class Inner {\n"
        "        public Inner() { }\n\n"
        "        public int run(int x) {\n"
        "            if (x > 0) { return x; }\n"
        "            return 0;\n"
        "        }\n"
        "    }\n\n"
        "    public void close() throws Exception {\n"
        "    }\n"
        "}\n\n"
        "interface Flat {\n"
        "    default int depth() { return 0; }\n"
        "}\n"
    )
    rows = {r["name"]: r for r in parse_java_entities("src/Outer.java", src)}
    assert rows["com.acme.app.Outer"]["doc_string"] == "Outer widget container."
    inner = rows["com.acme.app.Outer.Inner"]
    assert inner["kind"] == "class" and inner["doc_string"] == "Inner helper."
    ctor = rows["com.acme.app.Outer.Outer"]
    assert ctor["kind"] == "method"
    # ctor signature = class-qualified prefix + typed params, no return type
    assert ctor["signature"] == "com.acme.app.Outer(int size)"
    assert ctor["doc_string"] == "Builds an Outer."
    assert rows["com.acme.app.Outer.Inner.Inner"]["signature"] == "com.acme.app.Outer.Inner()"
    assert rows["com.acme.app.Outer.Inner.run"]["kind"] == "method"
    assert "com.acme.app.Outer.close" in rows
    assert rows["com.acme.app.Flat.depth"]["kind"] == "method"
    # the constructor belongs to its own class, never double-attributed
    assert "com.acme.app.Outer.Inner.Outer" not in rows


def test_cpp_namespace_and_nested_qualification():
    """E6: namespace spans qualify without emitting rows; methods attach
    to the innermost class; free functions to the enclosing namespace."""
    from kgcompass_spark.functions.code_entities import parse_cpp_entities

    src = (
        "namespace acme {\n"
        "namespace util {\n"
        "class Buffer {\n"
        " public:\n"
        "  int fill(char c) {\n"
        "    return 1;\n"
        "  }\n"
        "};\n"
        "}\n"
        "int free_fn(int a) {\n"
        "  return a;\n"
        "}\n"
        "}\n"
    )
    rows = {r["name"]: r for r in parse_cpp_entities("src/acme/buffer.cpp", src)}
    assert rows["src.acme.buffer.acme.util.Buffer"]["kind"] == "class"
    assert rows["src.acme.buffer.acme.util.Buffer.fill"]["kind"] == "method"
    # free functions carry their enclosing namespace (libclang's semantic
    # parent) — round 4: previously they fell back to the bare module
    assert rows["src.acme.buffer.acme.free_fn"]["kind"] == "method"
    # no rows for the namespaces themselves
    assert not any(n.endswith(".acme") or n.endswith(".util") for n in rows)


def test_java_braces_in_strings_and_comments():
    # a "}" inside a string literal or comment must not close the class
    # span early — the scan runs on string/comment-masked source
    from kgcompass_spark.functions.code_entities import parse_java_entities

    src = """package com.example;

public class Fmt {
    // a stray } in a line comment
    /* and one here } too */
    public String wrap(String s) {
        return "{" + s + "}";
    }

    public String tail() {
        char c = '}';
        return "done }";
    }
}
"""
    rows = {r["short_name"]: r for r in parse_java_entities("src/Fmt.java", src)}
    assert rows["Fmt"]["end_line"] == 14          # the real closing brace
    assert rows["wrap"]["name"] == "com.example.Fmt.wrap"
    assert rows["wrap"]["end_line"] == 8
    assert rows["tail"]["name"] == "com.example.Fmt.tail"
    assert rows["tail"]["end_line"] == 13


def test_java_declarations_inside_comments_ignored():
    from kgcompass_spark.functions.code_entities import parse_java_entities

    src = """package com.example;
// public class Ghost { }
/* public int phantom() { return 1; } */
public class Real {
    public int live() { return 2; }
}
"""
    rows = {r["short_name"] for r in parse_java_entities("src/Real.java", src)}
    assert rows == {"Real", "live"}


def test_cpp_braces_in_strings():
    from kgcompass_spark.functions.code_entities import parse_cpp_entities

    src = """namespace fmt {
class Writer {
public:
    void brace() {
        emit("}");
    }
    void after() {
        emit("ok");
    }
};
}
"""
    rows = {r["short_name"]: r for r in parse_cpp_entities("lib/writer.cpp", src)}
    assert rows["Writer"]["end_line"] == 10
    assert "brace" in rows and "after" in rows
    assert rows["after"]["name"].endswith("fmt.Writer.after")


def test_cpp_out_of_line_member_definitions():
    # libclang resolves `void Writer::brace() {}` to its semantic parent;
    # the structural scan now qualifies via the ::-chain + namespaces
    from kgcompass_spark.functions.code_entities import parse_cpp_entities

    src = """namespace fmt {
class Writer {
public:
    void brace();
};
void Writer::brace() {
    emit("x");
}
}
int Helper::calc(int v) {
    return v;
}
"""
    rows = {r["short_name"]: r for r in parse_cpp_entities("lib/writer.cpp", src)}
    assert rows["brace"]["name"] == "lib.writer.fmt.Writer.brace"
    assert rows["calc"]["name"] == "lib.writer.Helper.calc"


def test_cpp_template_declarations():
    from kgcompass_spark.functions.code_entities import parse_cpp_entities

    src = """template <typename T>
class Stack {
public:
    void push(T v) {
        data.push_back(v);
    }
};
template <class K, class V> struct Pair {
    K key() {
        return k;
    }
};
"""
    rows = {r["short_name"]: r for r in parse_cpp_entities("lib/stack.hpp", src)}
    assert rows["Stack"]["kind"] == "class"
    assert rows["Pair"]["kind"] == "class"        # same-line template prefix
    assert rows["push"]["name"].endswith("Stack.push")
    assert rows["key"]["name"].endswith("Pair.key")


def test_java_annotations_and_generics():
    # javalang observables: same-line annotations precede modifiers;
    # generic type parameters and nested generic returns keep signatures
    from kgcompass_spark.functions.code_entities import parse_java_entities

    src = """package com.ex;
@Entity public class Box {
    @Override public String toText() {
        return s;
    }
    public <T extends Number> List<T> filterAll(List<T> items, Map<String, T> idx) {
        return items;
    }
    @SuppressWarnings("unchecked")
    public Map<String, List<Integer>> index() {
        return m;
    }
}
"""
    rows = {r["short_name"]: r for r in parse_java_entities("com/ex/Box.java", src)}
    assert rows["Box"]["kind"] == "class"          # same-line @Entity
    assert rows["toText"]["name"] == "com.ex.Box.toText"   # same-line @Override
    assert (
        rows["filterAll"]["signature"]
        == "com.ex.Box.filterAll(List<T> items, Map<String, T> idx): List<T>"
    )
    assert "index" in rows


def test_java_bodyless_interface_and_abstract_methods():
    """Interface methods and abstract methods have no body but are
    MethodDeclaration nodes under javalang (language_factory.py:955-1010);
    the bodyless pass emits them with single-declaration spans and their
    javadoc, while statement-position calls (`return foo(x);`) and field
    initializers (`int L = compute();`) never match."""
    from kgcompass_spark.functions.code_entities import parse_java_entities

    src = (
        "package p;\n"
        "public interface Mapper<T, R> {\n"
        "    /** Transforms one value. */\n"
        "    R apply(T input);\n"
        "    default R twice(T in) { return apply(in); }\n"
        "}\n"
        "abstract class Base {\n"
        "    public abstract int size() throws IllegalStateException;\n"
        "    int use() {\n"
        "        doWork(1);\n"
        "        return helper(2);\n"
        "    }\n"
        "    private static final int LIMIT = compute();\n"
        "}\n"
    )
    rows = {r["name"]: r for r in parse_java_entities("p/Mapper.java", src)}
    assert rows["p.Mapper.apply"]["signature"] == "p.Mapper.apply(T input): R"
    assert rows["p.Mapper.apply"]["start_line"] == 4
    assert rows["p.Mapper.apply"]["end_line"] == 4
    assert rows["p.Mapper.apply"]["doc_string"] == "Transforms one value."
    assert rows["p.Base.size"]["start_line"] == 8
    assert rows["p.Base.size"]["end_line"] == 8  # abstract+throws: no body swallow
    assert rows["p.Base.use"]["end_line"] == 12
    for bad in ("doWork", "helper", "compute"):
        assert not any(n.endswith("." + bad) for n in rows), bad


def test_cpp_in_class_declarations():
    """C++ header-style member DECLARATIONS (no body) — pure virtual,
    const/noexcept — extract like libclang cursors; statements inside a
    definition body and member variables never match."""
    from kgcompass_spark.functions.code_entities import parse_cpp_entities

    src = (
        "namespace alpha {\n"
        "class Engine {\n"
        "public:\n"
        "    virtual void start(int mode) = 0;\n"
        "    std::vector<int> scan(const char* p) const noexcept;\n"
        "    int run() {\n"
        "        int v = helper(2);\n"
        "        tick(v);\n"
        "        return v;\n"
        "    }\n"
        "private:\n"
        "    int count_;\n"
        "    static Engine* instance;\n"
        "};\n"
        "}\n"
    )
    rows = {r["name"].split(".")[-1]: r for r in parse_cpp_entities("alpha/engine.h", src)}
    assert set(rows) == {"Engine", "start", "scan", "run"}
    assert rows["start"]["start_line"] == 4 and rows["start"]["end_line"] == 4
    assert rows["scan"]["signature"] == "scan(const char* p)"
    assert rows["run"]["end_line"] == 10


def test_cpp_multiline_and_nested_template_headers():
    """Multi-line template headers and template-template parameters are
    blanked by a balanced-angle walk before the class scan, so the
    declaration extracts; `operator<` never confuses the walk."""
    from kgcompass_spark.functions.code_entities import parse_cpp_entities

    src = (
        "template <typename T,\n"
        "          template<class> class C = std::vector>\n"
        "class Registry {\n"
        "public:\n"
        "    virtual T get(int i) const = 0;\n"
        "};\n"
        "bool operator<(const Registry<int, std::vector>& a,\n"
        "               const Registry<int, std::vector>& b) { return false; }\n"
    )
    rows = {r["name"].split(".")[-1]: r for r in parse_cpp_entities("r.hpp", src)}
    assert "Registry" in rows and rows["Registry"]["start_line"] == 3
    assert "get" in rows
    assert "operator" not in rows


def test_cpp_global_variables():
    """File/namespace-scope VAR_DECL parity (language_factory.py:722-730),
    minus the reference's preorder-walk noise: locals and class fields are
    excluded positionally."""
    from kgcompass_spark.functions.code_entities import parse_cpp_entities

    src = (
        "namespace cfg {\n"
        "static const int kMaxRetries = 5;\n"
        "extern bool g_ready;\n"
        "int counters[16];\n"
        "class Engine {\n"
        "    int field_;\n"
        "public:\n"
        "    int run() {\n"
        "        int local_v = 3;\n"
        "        return local_v;\n"
        "    }\n"
        "};\n"
        "}\n"
        "int top_level = 7;\n"
    )
    rows = {r["name"].split(".")[-1]: r["kind"] for r in parse_cpp_entities("cfg/l.cpp", src)}
    globals_found = {n for n, k in rows.items() if k == "global_var"}
    assert globals_found == {"kMaxRetries", "g_ready", "counters", "top_level"}
    assert "local_v" not in rows and "field_" not in rows


def test_java_overloads_get_distinct_generic_signatures():
    """Method identity is (name, signature, file_path) (reference
    knowledge_graph.py:165-172). Overloads of a generic method must yield
    DISTINCT javalang-shaped signatures, while annotation/whitespace
    formatting variants of the same declaration must NOT split identity."""
    from kgcompass_spark.functions.code_entities import parse_java_entities

    src = (
        "package p;\n"
        "public class Repo {\n"
        "    public List<String> find(List<String> keys) { return keys; }\n"
        "    public List<String> find(Map<String, Integer> idx) { return null; }\n"
        "    public List<String> find(List<String> keys, int limit) { return keys; }\n"
        "    public void store(String... parts) { }\n"
        "    public void store(int n) { }\n"
        "}\n"
    )
    rows = [r for r in parse_java_entities("p/Repo.java", src) if r["kind"] == "method"]
    sigs = {r["signature"] for r in rows}
    assert len(sigs) == len(rows) == 5
    assert "p.Repo.find(List<String> keys): List<String>" in sigs
    assert "p.Repo.find(Map<String, Integer> idx): List<String>" in sigs
    assert "p.Repo.find(List<String> keys, int limit): List<String>" in sigs
    # varargs flatten to the element type (javalang ignores the ellipsis)
    assert "p.Repo.store(String parts): void" in sigs

    # the same declaration under different formatting/annotations/modifier
    # order produces the IDENTICAL signature — no identity split
    variant = (
        "package p;\n"
        "public class Repo {\n"
        "    @Override public  List<String>   find( final List<String>  keys ) {\n"
        "        return keys;\n"
        "    }\n"
        "}\n"
    )
    vrows = [r for r in parse_java_entities("p/Repo.java", variant) if r["kind"] == "method"]
    assert vrows[0]["signature"] == "p.Repo.find(List<String> keys): List<String>"

    # generic method type-parameter section is not part of the return type
    gen = (
        "package p;\n"
        "public class U {\n"
        "    public static <T extends Number> T pick(List<T> xs, T dflt) { return dflt; }\n"
        "}\n"
    )
    grows = [r for r in parse_java_entities("p/U.java", gen) if r["kind"] == "method"]
    assert grows[0]["signature"] == "p.U.pick(List<T> xs, T dflt): T"


def test_cpp_if0_disabled_regions_not_extracted():
    """libclang sees post-preprocessor code (language_factory.py:616-801),
    so declarations inside `#if 0` regions must not become entities, an
    unbalanced `}` inside one must not corrupt later spans, and the live
    `#else` branch of a disabled conditional must still extract."""
    from kgcompass_spark.functions.code_entities import parse_cpp_entities

    src = (
        "#include <vector>\n"
        "#if 0\n"
        "class DeadClass {\n"
        "    void deadMethod(int x) { }\n"
        "};\n"
        "}  // unbalanced brace inside disabled code\n"
        "#endif\n"
        "class Live {\n"
        "public:\n"
        "    void run(int n) { work(n); }\n"
        "};\n"
        "#if false\n"
        "void alsoDead() { }\n"
        "#else\n"
        "void elseLives() { }\n"
        "#endif\n"
        "#if 0\n"
        "#if 1\n"
        "void nestedDead() { }\n"
        "#endif\n"
        "#endif\n"
        "void tail() { }\n"
    )
    rows = {r["short_name"]: r for r in parse_cpp_entities("src/live.cpp", src)}
    assert "DeadClass" not in rows
    assert "deadMethod" not in rows
    assert "alsoDead" not in rows
    assert "nestedDead" not in rows
    assert rows["Live"]["kind"] == "class"
    assert rows["run"]["name"].endswith("Live.run")
    assert "elseLives" in rows
    assert "tail" in rows  # span recovery after the unbalanced brace
    # feature-flag conditionals are NOT evaluated — both branches extract
    flagged = "#ifdef FEATURE_X\nvoid withFlag() { }\n#endif\n"
    frows = {r["short_name"] for r in parse_cpp_entities("src/f.cpp", flagged)}
    assert "withFlag" in frows


def test_java_wildcard_type_arguments_dropped():
    """Bare ``?`` type arguments drop anywhere in the list, mirroring the
    reference's None-arg filter (language_factory.py:1096): Map<String, ?>
    → Map<String>, Map<?, V> → Map<V>, Map<?, ?> → Map, List<?> → List."""
    from kgcompass_spark.functions.code_entities import parse_java_entities

    src = (
        "package p;\n"
        "public class W {\n"
        "    public void a(Map<String, ?> m) { }\n"
        "    public void b(Map<?, Integer> m) { }\n"
        "    public void c(Map<?, ?> m) { }\n"
        "    public void d(List<?> l) { }\n"
        "    public void e(Map<String, List<?>> m) { }\n"
        "}\n"
    )
    sigs = {
        r["name"].split(".")[-1]: r["signature"]
        for r in parse_java_entities("p/W.java", src)
        if r["kind"] == "method"
    }
    assert sigs["a"] == "p.W.a(Map<String> m): void"
    assert sigs["b"] == "p.W.b(Map<Integer> m): void"
    assert sigs["c"] == "p.W.c(Map m): void"
    assert sigs["d"] == "p.W.d(List l): void"
    assert sigs["e"] == "p.W.e(Map<String, List> m): void"


def test_cpp_macro_heads_and_namespace_alias():
    """E6 round-6 residuals: (1) object-like export macros — in-file
    defines AND unknown other-header macros — no longer hijack class
    names; (2) compiler attributes are erased like the preprocessor
    would; (3) `namespace a = app;` aliases resolve in out-of-line
    member chains, matching libclang's semantic parent."""
    from kgcompass_spark.functions.code_entities import parse_cpp_entities

    src = (
        '#define MYAPI __attribute__((visibility("default")))\n'
        "#define EXPORT\n"
        "namespace app {\n"
        "class MYAPI Widget {\n"
        " public:\n"
        "  void run(int n) { }\n"
        "};\n"
        "}\n"
        "namespace a = app;\n"
        "void a::Widget::stop(int n) { }\n"
        "class SOMELIB_API Gadget : public app::Widget {\n"
        "  void spin() { }\n"
        "};\n"
        "struct alignas(16) Vec { float x; };\n"
        "EXPORT int g_count = 3;\n"
    )
    rows = parse_cpp_entities("lib/w.cpp", src)
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], set()).add(r["name"])
    assert "lib.w.app.Widget" in by_kind["class"]          # not ...app.MYAPI
    assert "lib.w.Gadget" in by_kind["class"]              # not lib.w.SOMELIB_API
    assert "lib.w.Vec" in by_kind["class"]
    assert not any("MYAPI" in n or "SOMELIB_API" in n for n in by_kind["class"])
    assert "lib.w.app.Widget.run" in by_kind["method"]
    assert "lib.w.app.Widget.stop" in by_kind["method"]    # alias a → app
    assert "lib.w.Gadget.spin" in by_kind["method"]
    assert "lib.w.g_count" in by_kind["global_var"]


def test_java_annotation_bodies_and_text_blocks():
    """E5 tail fidelity: @interface declarations are NOT entities (the
    reference filters javalang ClassDeclaration only), annotation array
    arguments ({..} inside @Anno(...)) don't skew brace spans, and text
    blocks with braces/quotes inside stay invisible to the scan."""
    from kgcompass_spark.functions.code_entities import parse_java_entities

    src = (
        "package p;\n"
        "public @interface Marker {\n"
        "    int value() default 0;\n"
        "}\n"
        "@Marker(value = 1)\n"
        "public class Widget {\n"
        "    static final String Q = \"\"\"\n"
        "        { not a real { brace }\n"
        "        \"\"\";\n"
        "    @SuppressWarnings({\"unchecked\", \"raw\"})\n"
        "    public void run(int n) { }\n"
        "    @Anno(a = {1, 2}, b = \"x\")\n"
        "    public int size() { return 0; }\n"
        "}\n"
    )
    rows = parse_java_entities("p/W.java", src)
    names = {(r["kind"], r["name"]) for r in rows}
    assert ("class", "p.Widget") in names
    assert ("method", "p.Widget.run") in names
    assert ("method", "p.Widget.size") in names
    assert not any("Marker" in n for _, n in names)
    assert not any(n.endswith(".value") for _, n in names)
