// Minimal WebAssembly (MVP + sign-extension ops) interpreter — the native
// embedder for Circom-emitted witness-generator modules (the reference
// executes these via the wasmer VM, `legogroth16/src/circom/{witness,wasm}.rs`;
// SURVEY.md §2.3 item 2 calls for a C++ embedder).
//
// Scope: exactly what circom 2.x wasm needs — i32/i64 arithmetic, linear
// memory, globals, tables + call_indirect, structured control flow.  Floats
// are parsed but most float arithmetic traps (circom never emits it).
//
// C ABI (driven from Python via ctypes, `crypto_tpu/legogroth16/witness.py`):
//   void*   wasm_load(const uint8_t* bytes, uint64_t len, char* err, int errlen);
//   int     wasm_call(void* inst, const char* export_name,
//                     const int64_t* args, int nargs, int64_t* result);
//           returns: 0 ok (result written if the function returns a value),
//                    1 unknown export, 2 trap/exception (err via wasm_last_error)
//   const char* wasm_last_error(void* inst);
//   void    wasm_free(void* inst);

#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

struct Trap : std::runtime_error {
    explicit Trap(const std::string& m) : std::runtime_error(m) {}
};

// ---------------------------------------------------------------- parsing

struct Reader {
    const uint8_t* p;
    const uint8_t* end;
    uint32_t u8() {
        if (p >= end) throw Trap("eof");
        return *p++;
    }
    uint32_t u32_leb() {
        uint32_t r = 0; int s = 0;
        while (true) {
            uint32_t b = u8();
            r |= (b & 0x7f) << s;
            if (!(b & 0x80)) return r;
            s += 7;
        }
    }
    int64_t s64_leb() {
        int64_t r = 0; int s = 0; uint32_t b;
        do {
            b = u8();
            r |= (int64_t)(b & 0x7f) << s;
            s += 7;
        } while (b & 0x80);
        if (s < 64 && (b & 0x40)) r |= -((int64_t)1 << s);
        return r;
    }
    int32_t s32_leb() { return (int32_t)s64_leb(); }
    void skip(size_t n) {
        if (p + n > end) throw Trap("eof");
        p += n;
    }
    std::string name() {
        uint32_t n = u32_leb();
        if (p + n > end) throw Trap("eof");
        std::string s((const char*)p, n);
        p += n;
        return s;
    }
};

struct FuncType {
    std::vector<uint8_t> params;
    std::vector<uint8_t> results;
};

struct FuncBody {
    uint32_t type_idx;
    std::vector<uint8_t> code;        // body bytes (locals decl + exprs)
    uint32_t num_locals = 0;          // beyond params
    uint32_t code_start = 0;          // offset of first opcode in `code`
    // control-flow side tables keyed by opcode offset
    std::map<uint32_t, uint32_t> end_of;   // block/loop/if -> offset AFTER matching end
    std::map<uint32_t, uint32_t> else_of;  // if -> offset AFTER its else (0 if none)
};

struct Global {
    uint8_t type;
    int64_t value;
};

struct Export {
    uint8_t kind;
    uint32_t index;
};

struct Module {
    std::vector<FuncType> types;
    std::vector<uint32_t> import_func_types;   // imported funcs (host stubs)
    std::vector<std::string> import_names;
    std::vector<FuncBody> funcs;               // local functions
    std::vector<Global> globals;
    std::map<std::string, Export> exports;
    std::vector<uint32_t> table;               // funcref table
    std::vector<uint8_t> memory;
    uint32_t mem_pages = 0;
    uint32_t mem_max_pages = 65536;
};

const uint32_t PAGE = 65536;

void skip_const_expr(Reader& r, int64_t* out) {
    // init exprs: (i32.const|i64.const|global.get) ... end
    int64_t v = 0;
    while (true) {
        uint32_t op = r.u8();
        if (op == 0x0b) break;
        else if (op == 0x41) v = r.s32_leb();
        else if (op == 0x42) v = r.s64_leb();
        else if (op == 0x23) { r.u32_leb(); }
        else if (op == 0x43) { r.skip(4); }
        else if (op == 0x44) { r.skip(8); }
        else throw Trap("unsupported const expr op");
    }
    if (out) *out = v;
}

// Pre-scan a function body building block end/else tables.
void scan_body(FuncBody& f) {
    Reader r{f.code.data() + f.code_start, f.code.data() + f.code.size()};
    const uint8_t* base = f.code.data();
    std::vector<std::pair<uint32_t, uint8_t>> stack;  // (offset, opcode)
    std::vector<uint32_t> pending_else;
    while (r.p < r.end) {
        uint32_t off = (uint32_t)(r.p - base);
        uint32_t op = r.u8();
        switch (op) {
            case 0x02: case 0x03: case 0x04: {  // block/loop/if
                int64_t bt = r.s64_leb();        // blocktype
                (void)bt;
                stack.push_back({off, (uint8_t)op});
                break;
            }
            case 0x05: {                         // else
                if (stack.empty()) throw Trap("else without if");
                f.else_of[stack.back().first] = (uint32_t)(r.p - base);
                break;
            }
            case 0x0b: {                         // end
                if (stack.empty()) {
                    // function end
                    return;
                }
                f.end_of[stack.back().first] = (uint32_t)(r.p - base);
                stack.pop_back();
                break;
            }
            case 0x0c: case 0x0d: r.u32_leb(); break;        // br, br_if
            case 0x0e: {                                      // br_table
                uint32_t n = r.u32_leb();
                for (uint32_t i = 0; i <= n; i++) r.u32_leb();
                break;
            }
            case 0x10: r.u32_leb(); break;                    // call
            case 0x11: r.u32_leb(); r.u32_leb(); break;       // call_indirect
            case 0x20: case 0x21: case 0x22: case 0x23: case 0x24:
                r.u32_leb(); break;                           // local/global
            case 0x3f: case 0x40: r.u8(); break;              // memory.size/grow
            case 0x41: r.s32_leb(); break;
            case 0x42: r.s64_leb(); break;
            case 0x43: r.skip(4); break;
            case 0x44: r.skip(8); break;
            default:
                if (op >= 0x28 && op <= 0x3e) {               // load/store
                    r.u32_leb(); r.u32_leb();
                } else if (op == 0xfc) {                      // misc prefix
                    uint32_t sub = r.u32_leb();
                    if (sub == 8 || sub == 10) { r.u32_leb(); r.u32_leb(); }
                    else if (sub == 9 || sub == 11 || sub == 12 || sub == 13)
                        r.u32_leb();
                }
                // all other ops have no immediates
                break;
        }
    }
}

Module* parse(const uint8_t* bytes, uint64_t len) {
    auto* m = new Module();
    Reader r{bytes, bytes + len};
    if (len < 8 || memcmp(bytes, "\0asm", 4) != 0) throw Trap("bad magic");
    r.skip(8);
    std::vector<int64_t> data_offsets;
    while (r.p < r.end) {
        uint32_t sec = r.u8();
        uint32_t size = r.u32_leb();
        const uint8_t* sec_end = r.p + size;
        switch (sec) {
            case 1: {  // types
                uint32_t n = r.u32_leb();
                for (uint32_t i = 0; i < n; i++) {
                    if (r.u8() != 0x60) throw Trap("bad functype");
                    FuncType ft;
                    uint32_t np = r.u32_leb();
                    for (uint32_t j = 0; j < np; j++) ft.params.push_back(r.u8());
                    uint32_t nr = r.u32_leb();
                    for (uint32_t j = 0; j < nr; j++) ft.results.push_back(r.u8());
                    m->types.push_back(std::move(ft));
                }
                break;
            }
            case 2: {  // imports
                uint32_t n = r.u32_leb();
                for (uint32_t i = 0; i < n; i++) {
                    std::string mod = r.name();
                    std::string nm = r.name();
                    uint32_t kind = r.u8();
                    if (kind == 0) {
                        m->import_func_types.push_back(r.u32_leb());
                        m->import_names.push_back(mod + "." + nm);
                    } else if (kind == 2) {   // memory import
                        uint32_t flags = r.u8();
                        uint32_t mn = r.u32_leb();
                        if (flags & 1) r.u32_leb();
                        m->mem_pages = mn;
                        m->memory.resize((size_t)mn * PAGE, 0);
                    } else if (kind == 1) {   // table import
                        r.u8(); uint32_t flags = r.u8(); r.u32_leb();
                        if (flags & 1) r.u32_leb();
                    } else if (kind == 3) {   // global import
                        r.u8(); r.u8();
                        m->globals.push_back({0x7f, 0});
                    }
                }
                break;
            }
            case 3: {  // function section
                uint32_t n = r.u32_leb();
                for (uint32_t i = 0; i < n; i++) {
                    FuncBody f;
                    f.type_idx = r.u32_leb();
                    m->funcs.push_back(std::move(f));
                }
                break;
            }
            case 4: {  // table
                uint32_t n = r.u32_leb();
                for (uint32_t i = 0; i < n; i++) {
                    r.u8();  // elemtype
                    uint32_t flags = r.u8();
                    uint32_t mn = r.u32_leb();
                    if (flags & 1) r.u32_leb();
                    m->table.resize(mn, UINT32_MAX);
                }
                break;
            }
            case 5: {  // memory
                uint32_t n = r.u32_leb();
                for (uint32_t i = 0; i < n; i++) {
                    uint32_t flags = r.u8();
                    uint32_t mn = r.u32_leb();
                    if (flags & 1) m->mem_max_pages = r.u32_leb();
                    m->mem_pages = mn;
                    m->memory.resize((size_t)mn * PAGE, 0);
                }
                break;
            }
            case 6: {  // globals
                uint32_t n = r.u32_leb();
                for (uint32_t i = 0; i < n; i++) {
                    uint8_t t = r.u8();
                    r.u8();  // mutability
                    int64_t v = 0;
                    skip_const_expr(r, &v);
                    m->globals.push_back({t, v});
                }
                break;
            }
            case 7: {  // exports
                uint32_t n = r.u32_leb();
                for (uint32_t i = 0; i < n; i++) {
                    std::string nm = r.name();
                    uint8_t kind = r.u8();
                    uint32_t idx = r.u32_leb();
                    m->exports[nm] = {kind, idx};
                }
                break;
            }
            case 9: {  // element segments
                uint32_t n = r.u32_leb();
                for (uint32_t i = 0; i < n; i++) {
                    uint32_t flags = r.u32_leb();
                    if (flags != 0) throw Trap("unsupported elem segment");
                    int64_t off = 0;
                    skip_const_expr(r, &off);
                    uint32_t cnt = r.u32_leb();
                    if (off + cnt > m->table.size())
                        m->table.resize(off + cnt, UINT32_MAX);
                    for (uint32_t j = 0; j < cnt; j++)
                        m->table[off + j] = r.u32_leb();
                }
                break;
            }
            case 10: {  // code
                uint32_t n = r.u32_leb();
                for (uint32_t i = 0; i < n; i++) {
                    uint32_t body_size = r.u32_leb();
                    const uint8_t* body_end = r.p + body_size;
                    FuncBody& f = m->funcs[i];
                    f.code.assign(r.p, body_end);
                    Reader lr{r.p, body_end};
                    uint32_t ngroups = lr.u32_leb();
                    uint32_t total = 0;
                    for (uint32_t g = 0; g < ngroups; g++) {
                        uint32_t cnt = lr.u32_leb();
                        lr.u8();
                        total += cnt;
                    }
                    f.num_locals = total;
                    f.code_start = (uint32_t)(lr.p - r.p);
                    r.p = body_end;
                    scan_body(f);
                }
                break;
            }
            case 11: {  // data
                uint32_t n = r.u32_leb();
                for (uint32_t i = 0; i < n; i++) {
                    uint32_t flags = r.u32_leb();
                    if (flags != 0) throw Trap("unsupported data segment");
                    int64_t off = 0;
                    skip_const_expr(r, &off);
                    uint32_t cnt = r.u32_leb();
                    if (off + cnt > m->memory.size())
                        throw Trap("data segment out of bounds");
                    memcpy(m->memory.data() + off, r.p, cnt);
                    r.skip(cnt);
                }
                break;
            }
            default:
                r.p = sec_end;  // skip custom/unknown sections
        }
        r.p = sec_end;
    }
    return m;
}

// ---------------------------------------------------------------- execution

struct Instance {
    std::unique_ptr<Module> mod;
    std::string last_error;
    int64_t exception_code = 0;

    uint32_t num_imports() const {
        return (uint32_t)mod->import_func_types.size();
    }

    void check_mem(uint64_t addr, uint64_t n) {
        if (addr + n > mod->memory.size()) throw Trap("memory out of bounds");
    }

    template <typename T>
    T load(uint64_t addr) {
        check_mem(addr, sizeof(T));
        T v;
        memcpy(&v, mod->memory.data() + addr, sizeof(T));
        return v;
    }
    template <typename T>
    void store(uint64_t addr, T v) {
        check_mem(addr, sizeof(T));
        memcpy(mod->memory.data() + addr, &v, sizeof(T));
    }

    int64_t call_function(uint32_t func_idx, const int64_t* args, int nargs,
                          bool* has_result);
    void invoke(uint32_t func_idx, std::vector<int64_t>& stack);
};

struct Label {
    uint8_t opcode;        // 0x02 block / 0x03 loop / 0x04 if
    uint32_t start;        // offset of the block opcode
    uint32_t stack_height; // value stack height at entry
    uint8_t arity;         // 0 or 1 (MVP blocktypes)
};

void Instance::invoke(uint32_t func_idx, std::vector<int64_t>& stack) {
    Module& M = *mod;
    uint32_t ni = num_imports();
    if (func_idx < ni) {
        // host stub: circom runtime imports.  exceptionHandler records the
        // code and traps; the printing hooks are no-ops.
        const std::string& nm = M.import_names[func_idx];
        const FuncType& ft = M.types[M.import_func_types[func_idx]];
        std::vector<int64_t> a(ft.params.size());
        for (size_t i = ft.params.size(); i-- > 0;) {
            a[i] = stack.back();
            stack.pop_back();
        }
        if (nm.find("exceptionHandler") != std::string::npos) {
            exception_code = a.empty() ? 0 : a[0];
            throw Trap("circom exception " + std::to_string(exception_code));
        }
        if (!ft.results.empty()) stack.push_back(0);
        return;
    }
    FuncBody& f = M.funcs[func_idx - ni];
    const FuncType& ft = M.types[f.type_idx];
    size_t np = ft.params.size();
    std::vector<int64_t> locals(np + f.num_locals, 0);
    for (size_t i = np; i-- > 0;) {
        locals[i] = stack.back();
        stack.pop_back();
    }

    const uint8_t* base = f.code.data();
    Reader r{base + f.code_start, base + f.code.size()};
    std::vector<Label> labels;

    auto do_branch = [&](uint32_t depth) -> bool {
        // returns true if function returns
        if (depth >= labels.size()) return true;  // branch out of function
        Label target = labels[labels.size() - 1 - depth];
        for (uint32_t i = 0; i <= depth; i++) labels.pop_back();
        if (target.opcode == 0x03) {
            // loop: branch to start (re-push the label), no result values
            while (stack.size() > target.stack_height) stack.pop_back();
            labels.push_back(target);
            r.p = base + target.start;
            uint32_t op = r.u8();
            (void)op;
            r.s64_leb();  // skip blocktype again
        } else {
            // block/if: jump after end, keep arity results
            int64_t res = 0;
            if (target.arity) { res = stack.back(); }
            while (stack.size() > target.stack_height) stack.pop_back();
            if (target.arity) stack.push_back(res);
            r.p = base + f.end_of.at(target.start);
        }
        return false;
    };

    while (true) {
        if (r.p >= r.end) return;  // implicit end of function
        uint32_t off = (uint32_t)(r.p - base);
        uint32_t op = r.u8();
        switch (op) {
            case 0x00: throw Trap("unreachable");
            case 0x01: break;  // nop
            case 0x02: case 0x03: {  // block / loop
                int64_t bt = r.s64_leb();
                labels.push_back({(uint8_t)op, off, (uint32_t)stack.size(),
                                  (uint8_t)(bt == -64 ? 0 : 1)});
                break;
            }
            case 0x04: {  // if
                int64_t bt = r.s64_leb();
                int32_t c = (int32_t)stack.back(); stack.pop_back();
                labels.push_back({0x04, off, (uint32_t)stack.size(),
                                  (uint8_t)(bt == -64 ? 0 : 1)});
                if (!c) {
                    auto it = f.else_of.find(off);
                    if (it != f.else_of.end()) {
                        r.p = base + it->second;   // start of else body
                    } else {
                        labels.pop_back();
                        r.p = base + f.end_of.at(off);
                    }
                }
                break;
            }
            case 0x05: {  // else (reached after then-branch): jump to end
                Label l = labels.back();
                labels.pop_back();
                r.p = base + f.end_of.at(l.start);
                break;
            }
            case 0x0b: {  // end
                if (labels.empty()) return;  // function end
                labels.pop_back();
                break;
            }
            case 0x0c: {  // br
                uint32_t d = r.u32_leb();
                if (do_branch(d)) return;
                break;
            }
            case 0x0d: {  // br_if
                uint32_t d = r.u32_leb();
                int32_t c = (int32_t)stack.back(); stack.pop_back();
                if (c) { if (do_branch(d)) return; }
                break;
            }
            case 0x0e: {  // br_table
                uint32_t n = r.u32_leb();
                std::vector<uint32_t> tgts(n);
                for (uint32_t i = 0; i < n; i++) tgts[i] = r.u32_leb();
                uint32_t def = r.u32_leb();
                uint32_t idx = (uint32_t)(int32_t)stack.back(); stack.pop_back();
                uint32_t d = idx < n ? tgts[idx] : def;
                if (do_branch(d)) return;
                break;
            }
            case 0x0f: return;  // return
            case 0x10: {  // call
                uint32_t fi = r.u32_leb();
                invoke(fi, stack);
                break;
            }
            case 0x11: {  // call_indirect
                uint32_t type_idx = r.u32_leb();
                (void)type_idx;
                r.u32_leb();  // table idx (0)
                uint32_t elem = (uint32_t)(int32_t)stack.back(); stack.pop_back();
                if (elem >= M.table.size() || M.table[elem] == UINT32_MAX)
                    throw Trap("bad indirect call");
                invoke(M.table[elem], stack);
                break;
            }
            case 0x1a: stack.pop_back(); break;  // drop
            case 0x1b: {  // select
                int32_t c = (int32_t)stack.back(); stack.pop_back();
                int64_t b = stack.back(); stack.pop_back();
                int64_t a = stack.back(); stack.pop_back();
                stack.push_back(c ? a : b);
                break;
            }
            case 0x20: stack.push_back(locals[r.u32_leb()]); break;
            case 0x21: locals[r.u32_leb()] = stack.back(); stack.pop_back(); break;
            case 0x22: locals[r.u32_leb()] = stack.back(); break;
            case 0x23: stack.push_back(M.globals[r.u32_leb()].value); break;
            case 0x24: M.globals[r.u32_leb()].value = stack.back(); stack.pop_back(); break;

            // ---- memory loads ----
            case 0x28: case 0x29: case 0x2a: case 0x2b:
            case 0x2c: case 0x2d: case 0x2e: case 0x2f:
            case 0x30: case 0x31: case 0x32: case 0x33:
            case 0x34: case 0x35: {
                r.u32_leb();  // align
                uint32_t o = r.u32_leb();
                uint64_t addr = (uint32_t)stack.back() + (uint64_t)o;
                stack.pop_back();
                int64_t v;
                switch (op) {
                    case 0x28: v = (int64_t)(int32_t)load<uint32_t>(addr); break;
                    case 0x29: v = (int64_t)load<uint64_t>(addr); break;
                    case 0x2a: v = (int64_t)(int32_t)load<uint32_t>(addr); break; // f32.load (bits)
                    case 0x2b: v = (int64_t)load<uint64_t>(addr); break;         // f64.load (bits)
                    case 0x2c: v = (int64_t)(int8_t)load<uint8_t>(addr); break;
                    case 0x2d: v = (int64_t)load<uint8_t>(addr); break;
                    case 0x2e: v = (int64_t)(int16_t)load<uint16_t>(addr); break;
                    case 0x2f: v = (int64_t)load<uint16_t>(addr); break;
                    case 0x30: v = (int64_t)(int8_t)load<uint8_t>(addr); break;
                    case 0x31: v = (int64_t)load<uint8_t>(addr); break;
                    case 0x32: v = (int64_t)(int16_t)load<uint16_t>(addr); break;
                    case 0x33: v = (int64_t)load<uint16_t>(addr); break;
                    case 0x34: v = (int64_t)(int32_t)load<uint32_t>(addr); break;
                    case 0x35: v = (int64_t)load<uint32_t>(addr); break;
                    default: v = 0;
                }
                stack.push_back(v);
                break;
            }
            // ---- memory stores ----
            case 0x36: case 0x37: case 0x38: case 0x39:
            case 0x3a: case 0x3b: case 0x3c: case 0x3d: case 0x3e: {
                r.u32_leb();
                uint32_t o = r.u32_leb();
                int64_t v = stack.back(); stack.pop_back();
                uint64_t addr = (uint32_t)stack.back() + (uint64_t)o;
                stack.pop_back();
                switch (op) {
                    case 0x36: store<uint32_t>(addr, (uint32_t)v); break;
                    case 0x37: store<uint64_t>(addr, (uint64_t)v); break;
                    case 0x38: store<uint32_t>(addr, (uint32_t)v); break;
                    case 0x39: store<uint64_t>(addr, (uint64_t)v); break;
                    case 0x3a: store<uint8_t>(addr, (uint8_t)v); break;
                    case 0x3b: store<uint16_t>(addr, (uint16_t)v); break;
                    case 0x3c: store<uint8_t>(addr, (uint8_t)v); break;
                    case 0x3d: store<uint16_t>(addr, (uint16_t)v); break;
                    case 0x3e: store<uint32_t>(addr, (uint32_t)v); break;
                }
                break;
            }
            case 0x3f: {  // memory.size
                r.u8();
                stack.push_back((int64_t)(M.memory.size() / PAGE));
                break;
            }
            case 0x40: {  // memory.grow
                r.u8();
                int64_t delta = stack.back(); stack.pop_back();
                uint64_t cur = M.memory.size() / PAGE;
                uint64_t want = cur + (uint64_t)delta;
                if (want > M.mem_max_pages || want > 65536) {
                    stack.push_back(-1);
                } else {
                    M.memory.resize(want * PAGE, 0);
                    stack.push_back((int64_t)cur);
                }
                break;
            }
            case 0x41: stack.push_back(r.s32_leb()); break;
            case 0x42: stack.push_back(r.s64_leb()); break;
            case 0x43: { uint32_t b; memcpy(&b, r.p, 4); r.skip(4); stack.push_back((int64_t)b); break; }
            case 0x44: { uint64_t b; memcpy(&b, r.p, 8); r.skip(8); stack.push_back((int64_t)b); break; }

            default: {
                // numeric ops without immediates
                auto pop = [&]() { int64_t v = stack.back(); stack.pop_back(); return v; };
                auto push = [&](int64_t v) { stack.push_back(v); };
                auto pop32 = [&]() { return (uint32_t)pop(); };
                auto pop64 = [&]() { return (uint64_t)pop(); };
                switch (op) {
                    case 0x45: push(pop32() == 0); break;                      // i32.eqz
                    case 0x46: { uint32_t b = pop32(), a = pop32(); push(a == b); break; }
                    case 0x47: { uint32_t b = pop32(), a = pop32(); push(a != b); break; }
                    case 0x48: { int32_t b = (int32_t)pop32(), a = (int32_t)pop32(); push(a < b); break; }
                    case 0x49: { uint32_t b = pop32(), a = pop32(); push(a < b); break; }
                    case 0x4a: { int32_t b = (int32_t)pop32(), a = (int32_t)pop32(); push(a > b); break; }
                    case 0x4b: { uint32_t b = pop32(), a = pop32(); push(a > b); break; }
                    case 0x4c: { int32_t b = (int32_t)pop32(), a = (int32_t)pop32(); push(a <= b); break; }
                    case 0x4d: { uint32_t b = pop32(), a = pop32(); push(a <= b); break; }
                    case 0x4e: { int32_t b = (int32_t)pop32(), a = (int32_t)pop32(); push(a >= b); break; }
                    case 0x4f: { uint32_t b = pop32(), a = pop32(); push(a >= b); break; }
                    case 0x50: push(pop64() == 0); break;                      // i64.eqz
                    case 0x51: { uint64_t b = pop64(), a = pop64(); push(a == b); break; }
                    case 0x52: { uint64_t b = pop64(), a = pop64(); push(a != b); break; }
                    case 0x53: { int64_t b = (int64_t)pop64(), a = (int64_t)pop64(); push(a < b); break; }
                    case 0x54: { uint64_t b = pop64(), a = pop64(); push(a < b); break; }
                    case 0x55: { int64_t b = (int64_t)pop64(), a = (int64_t)pop64(); push(a > b); break; }
                    case 0x56: { uint64_t b = pop64(), a = pop64(); push(a > b); break; }
                    case 0x57: { int64_t b = (int64_t)pop64(), a = (int64_t)pop64(); push(a <= b); break; }
                    case 0x58: { uint64_t b = pop64(), a = pop64(); push(a <= b); break; }
                    case 0x59: { int64_t b = (int64_t)pop64(), a = (int64_t)pop64(); push(a >= b); break; }
                    case 0x5a: { uint64_t b = pop64(), a = pop64(); push(a >= b); break; }
                    case 0x67: { uint32_t a = pop32(); push(a ? __builtin_clz(a) : 32); break; }
                    case 0x68: { uint32_t a = pop32(); push(a ? __builtin_ctz(a) : 32); break; }
                    case 0x69: { uint32_t a = pop32(); push(__builtin_popcount(a)); break; }
                    case 0x6a: { uint32_t b = pop32(), a = pop32(); push((int64_t)(int32_t)(a + b)); break; }
                    case 0x6b: { uint32_t b = pop32(), a = pop32(); push((int64_t)(int32_t)(a - b)); break; }
                    case 0x6c: { uint32_t b = pop32(), a = pop32(); push((int64_t)(int32_t)(a * b)); break; }
                    case 0x6d: { int32_t b = (int32_t)pop32(), a = (int32_t)pop32();
                                 if (!b) throw Trap("div by zero");
                                 if (a == INT32_MIN && b == -1) throw Trap("int overflow");
                                 push((int64_t)(a / b)); break; }
                    case 0x6e: { uint32_t b = pop32(), a = pop32();
                                 if (!b) throw Trap("div by zero");
                                 push((int64_t)(int32_t)(a / b)); break; }
                    case 0x6f: { int32_t b = (int32_t)pop32(), a = (int32_t)pop32();
                                 if (!b) throw Trap("div by zero");
                                 if (a == INT32_MIN && b == -1) { push(0); break; }
                                 push((int64_t)(a % b)); break; }
                    case 0x70: { uint32_t b = pop32(), a = pop32();
                                 if (!b) throw Trap("div by zero");
                                 push((int64_t)(int32_t)(a % b)); break; }
                    case 0x71: { uint32_t b = pop32(), a = pop32(); push((int64_t)(int32_t)(a & b)); break; }
                    case 0x72: { uint32_t b = pop32(), a = pop32(); push((int64_t)(int32_t)(a | b)); break; }
                    case 0x73: { uint32_t b = pop32(), a = pop32(); push((int64_t)(int32_t)(a ^ b)); break; }
                    case 0x74: { uint32_t b = pop32(), a = pop32(); push((int64_t)(int32_t)(a << (b & 31))); break; }
                    case 0x75: { uint32_t b = pop32(); int32_t a = (int32_t)pop32(); push((int64_t)(a >> (b & 31))); break; }
                    case 0x76: { uint32_t b = pop32(), a = pop32(); push((int64_t)(int32_t)(a >> (b & 31))); break; }
                    case 0x77: { uint32_t b = pop32() & 31, a = pop32();
                                 push((int64_t)(int32_t)((a << b) | (a >> ((32 - b) & 31)))); break; }
                    case 0x78: { uint32_t b = pop32() & 31, a = pop32();
                                 push((int64_t)(int32_t)((a >> b) | (a << ((32 - b) & 31)))); break; }
                    case 0x79: { uint64_t a = pop64(); push(a ? __builtin_clzll(a) : 64); break; }
                    case 0x7a: { uint64_t a = pop64(); push(a ? __builtin_ctzll(a) : 64); break; }
                    case 0x7b: { uint64_t a = pop64(); push(__builtin_popcountll(a)); break; }
                    case 0x7c: { uint64_t b = pop64(), a = pop64(); push((int64_t)(a + b)); break; }
                    case 0x7d: { uint64_t b = pop64(), a = pop64(); push((int64_t)(a - b)); break; }
                    case 0x7e: { uint64_t b = pop64(), a = pop64(); push((int64_t)(a * b)); break; }
                    case 0x7f: { int64_t b = (int64_t)pop64(), a = (int64_t)pop64();
                                 if (!b) throw Trap("div by zero");
                                 if (a == INT64_MIN && b == -1) throw Trap("int overflow");
                                 push(a / b); break; }
                    case 0x80: { uint64_t b = pop64(), a = pop64();
                                 if (!b) throw Trap("div by zero");
                                 push((int64_t)(a / b)); break; }
                    case 0x81: { int64_t b = (int64_t)pop64(), a = (int64_t)pop64();
                                 if (!b) throw Trap("div by zero");
                                 if (a == INT64_MIN && b == -1) { push(0); break; }
                                 push(a % b); break; }
                    case 0x82: { uint64_t b = pop64(), a = pop64();
                                 if (!b) throw Trap("div by zero");
                                 push((int64_t)(a % b)); break; }
                    case 0x83: { uint64_t b = pop64(), a = pop64(); push((int64_t)(a & b)); break; }
                    case 0x84: { uint64_t b = pop64(), a = pop64(); push((int64_t)(a | b)); break; }
                    case 0x85: { uint64_t b = pop64(), a = pop64(); push((int64_t)(a ^ b)); break; }
                    case 0x86: { uint64_t b = pop64() & 63, a = pop64(); push((int64_t)(a << b)); break; }
                    case 0x87: { uint64_t b = pop64() & 63; int64_t a = (int64_t)pop64(); push(a >> b); break; }
                    case 0x88: { uint64_t b = pop64() & 63, a = pop64(); push((int64_t)(a >> b)); break; }
                    case 0x89: { uint64_t b = pop64() & 63, a = pop64();
                                 push((int64_t)((a << b) | (a >> ((64 - b) & 63)))); break; }
                    case 0x8a: { uint64_t b = pop64() & 63, a = pop64();
                                 push((int64_t)((a >> b) | (a << ((64 - b) & 63)))); break; }
                    case 0xa7: push((int64_t)(int32_t)(uint32_t)pop64()); break;  // i32.wrap_i64
                    case 0xac: push((int64_t)(int32_t)pop32()); break;            // i64.extend_i32_s
                    case 0xad: push((int64_t)(uint32_t)pop32()); break;           // i64.extend_i32_u
                    case 0xc0: push((int64_t)(int8_t)pop32()); break;             // i32.extend8_s
                    case 0xc1: push((int64_t)(int16_t)pop32()); break;            // i32.extend16_s
                    case 0xc2: push((int64_t)(int8_t)pop64()); break;             // i64.extend8_s
                    case 0xc3: push((int64_t)(int16_t)pop64()); break;            // i64.extend16_s
                    case 0xc4: push((int64_t)(int32_t)pop64()); break;            // i64.extend32_s
                    default:
                        throw Trap("unsupported opcode " + std::to_string(op));
                }
            }
        }
    }
}

int64_t Instance::call_function(uint32_t func_idx, const int64_t* args,
                                int nargs, bool* has_result) {
    std::vector<int64_t> stack;
    for (int i = 0; i < nargs; i++) stack.push_back(args[i]);
    invoke(func_idx, stack);
    uint32_t ni = num_imports();
    const FuncType& ft =
        func_idx < ni ? mod->types[mod->import_func_types[func_idx]]
                      : mod->types[mod->funcs[func_idx - ni].type_idx];
    *has_result = !ft.results.empty();
    return *has_result && !stack.empty() ? stack.back() : 0;
}

}  // namespace

extern "C" {

void* wasm_load(const uint8_t* bytes, uint64_t len, char* err, int errlen) {
    try {
        auto* inst = new Instance();
        inst->mod.reset(parse(bytes, len));
        return inst;
    } catch (const std::exception& e) {
        if (err && errlen > 0) {
            strncpy(err, e.what(), errlen - 1);
            err[errlen - 1] = 0;
        }
        return nullptr;
    }
}

int wasm_call(void* p, const char* name, const int64_t* args, int nargs,
              int64_t* result) {
    auto* inst = (Instance*)p;
    auto it = inst->mod->exports.find(name);
    if (it == inst->mod->exports.end() || it->second.kind != 0) return 1;
    try {
        bool has_result = false;
        int64_t r = inst->call_function(it->second.index, args, nargs,
                                        &has_result);
        if (result) *result = has_result ? r : 0;
        return 0;
    } catch (const std::exception& e) {
        inst->last_error = e.what();
        return 2;
    }
}

const char* wasm_last_error(void* p) {
    return ((Instance*)p)->last_error.c_str();
}

void wasm_free(void* p) { delete (Instance*)p; }

}  // extern "C"
