// Golden generator: runs the REFERENCE parser (patched only to run its
// lexer in-process instead of a piscina worker pool; see /tmp/refshim —
// the patch is mechanical: `piscina` import replaced with a class whose
// run() awaits lex() on the main thread) over the reference fixture
// corpus and a set of quirk micro-fixtures, committing the resulting
// node trees as JSON goldens.
//
// Usage: node tools/gen_goldens.mjs <shimDir> <fixtureDir> <outDir>
//   e.g. node tools/gen_goldens.mjs /tmp/refshim /root/reference/test/fixtures tests/goldens
import { readdirSync, writeFileSync, mkdirSync } from "node:fs";
import { join } from "node:path";

const [shimDir, fixtureDir, outDir] = process.argv.slice(2);
const { HTMLParser } = await import(join(shimDir, "HTMLParser.js"));

mkdirSync(outDir, { recursive: true });

// JSON-stringify, escaping all non-ASCII (incl. lone surrogates) so the
// files are plain ASCII on disk and Python json.loads round-trips the
// exact JS string semantics (surrogate pairs recombine automatically).
function stableJson(value) {
  return JSON.stringify(value, (_k, v) => v, 2).replace(
    /[-￿]/g,
    (ch) => "\\u" + ch.charCodeAt(0).toString(16).padStart(4, "0")
  );
}

// 1. Fixture files, default options (lower casing, selfClosing honored)
const fixtures = {};
for (const name of readdirSync(fixtureDir).sort()) {
  const parser = new HTMLParser();
  const nodes = await parser.parseFile(join(fixtureDir, name)).toArray();
  fixtures[name] = nodes;
}
writeFileSync(join(outDir, "fixtures_default.json"), stableJson(fixtures));

// 2. Option variants over selected fixtures
const variantSpecs = [
  ["preserve", { tagNameCasing: "preserve" }],
  ["upper", { tagNameCasing: "upper" }],
  ["ignoreSelfClosing", { ignoreSelfClosingSyntax: true }],
  ["preserve_ignoreSelfClosing", { tagNameCasing: "preserve", ignoreSelfClosingSyntax: true }],
];
const variantFixtures = [
  "simpleComponent.tmph.html",
  "inlineSubComponents.tmph.html",
  "componentWithScripts.tmph.html",
  "componentWithStyles.tmph.html",
  "layout.tmph.html",
  "unicode.tmph.html",
];
const variants = {};
for (const [vname, opts] of variantSpecs) {
  variants[vname] = {};
  for (const fname of variantFixtures) {
    const parser = new HTMLParser(opts);
    variants[vname][fname] = await parser.parseFile(join(fixtureDir, fname)).toArray();
  }
}
writeFileSync(join(outDir, "fixtures_variants.json"), stableJson(variants));

// 3. Quirk micro-fixtures via parseString (FIXTURES.md par.4 plus extras)
const micro = [
  ["nul_is_eof", "<div>ab\u0000cd</div>", {}],
  ["br_upper_not_void", "<BR>x", {}],
  ["br_lower_void", "<br>x", {}],
  ["script_upper_not_raw", "<SCRIPT>a<b>c</SCRIPT>", {}],
  ["digit_zero_tagname", "<h0>x</h0>", {}],
  ["crlf_two_lines", "a\r\n<b>x</b>", {}],
  ["spaced_equals", '<div foo = "bar">x</div>', {}],
  ["ancestor_pop", "<a><b><c>t</a>z", {}],
  ["raw_quoted_closer", '<script>var s="</script>";</script>k', {}],
  ["unquoted_and_bool", "<div a=1 b>x</div>", {}],
  ["comment_trimmed", "<!--  padded comment  -->", {}],
  ["preserve_mismatch_close", "<Div></div>hello", { tagNameCasing: "preserve" }],
  ["ignore_self_closing", "<div />Hello!", { ignoreSelfClosingSyntax: true }],
  ["self_close_space_no", "<div / >x", {}],
  ["unquoted_slash_value", "<div a=b/>x", {}],
  ["quote_then_selfclose", '<div a="x"/>y', {}],
  ["escaped_quote_attr", '<div a="s\\"t\\\\u">x</div>', {}],
  ["lt_in_attr", "<div a=b<c>x</div>", {}],
  ["double_lt_closing", "<p><</p>z", {}],
  ["doctype_lower_is_text", "<!doctype html><p>x</p>", {}],
  ["doctype_upper", "<!DOCTYPE  html  ><p>x</p>", {}],
  ["comment_dashes", "<!-- a -- > -->tail", {}],
  ["raw_style_quotes", "<style>a[x='</style>']{}</style>q", {}],
  ["raw_textarea_plain", "<textarea>var '</nope' </textarea>t", {}],
  ["raw_title", "<title>Hello <b> world</title>t", {}],
  ["raw_script_backtick", "<script>let t=`</script>`;</script>u", {}],
  ["closer_attrs_junk", "<div>x</div junk='y' >tail", {}],
  ["unterminated_tag", "<div><span attr", {}],
  ["unterminated_quote", '<div a="unclosed>text', {}],
  ["stray_closer_ignored", "a</b>c", {}],
  ["void_with_attrs", '<img src="a.png" alt=hi>t', {}],
  ["nested_same_tag", "<div><div>a</div>b</div>c", {}],
  ["astral_tagname", "<hey-\u{1F44B}>wave</hey-\u{1F44B}>z", {}],
  ["empty_string", "", {}],
  ["only_text", "just text\nsecond line", {}],
  ["attr_no_value_eq_end", "<div a=>x</div>", {}],
  ["attr_eq_space_value", "<div a= b>x</div>", {}],
  ["multiline_attr", '<div a="line1\nline2">x</div>', {}],
  ["tag_case_close_lower", "<DIV>x</div>y", {}],
  ["upper_casing_close", "<div>x</DIV>y", { tagNameCasing: "upper" }],
  ["whitespace_preserved", "<p>  a  \n  b  </p>", {}],
  ["comment_in_tag", "<div <!-- c -->>x", {}],
  ["slot_like", "<slot name=header></slot>x", {}],
  ["pre_not_raw", "<pre># md *text*</pre>z", {}],
  ["vtab_formfeed_lines", "a\u000b<b>x</b>\u000cz", {}],
  ["nbsp_comment_trim", "<!--\u00a0padded\u00a0-->t", {}],
  ["empty_raw_script", "<script></script>t", {}],
  ["script_eof_in_quote", "<script>var a='</script>", {}],
];
const microOut = {};
for (const [name, input, opts] of micro) {
  const parser = new HTMLParser(opts);
  let result;
  try {
    result = { nodes: await parser.parseString(input).toArray() };
  } catch (err) {
    result = { error: String(err.message ?? err) };
  }
  microOut[name] = { input, options: opts, ...result };
}
writeFileSync(join(outDir, "micro_quirks.json"), stableJson(microOut));
console.log("goldens written:", Object.keys(fixtures).length, "fixtures,",
  Object.keys(microOut).length, "micro");
