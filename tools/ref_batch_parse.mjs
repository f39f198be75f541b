// Differential-fuzz harness: parse a batch of strings with the REFERENCE
// parser (in-process piscina shim, see tools/gen_goldens.mjs) and print
// the node trees as ASCII-escaped JSON.
//
// stdin:  JSON array of {input: string, options: object}
// stdout: JSON array of {nodes: [...]} | {error: string}
//
// Usage: node tools/ref_batch_parse.mjs <shimDir> < cases.json
import { join } from "node:path";

const [shimDir] = process.argv.slice(2);
const { HTMLParser } = await import(join(shimDir, "HTMLParser.js"));

let raw = "";
for await (const chunk of process.stdin) raw += chunk;
const cases = JSON.parse(raw);

const out = [];
for (const { input, options } of cases) {
  const parser = new HTMLParser(options ?? {});
  try {
    out.push({ nodes: await parser.parseString(input).toArray() });
  } catch (err) {
    out.push({ error: String(err.message ?? err) });
  }
}
process.stdout.write(
  JSON.stringify(out).replace(/[-￿]/g,
    (ch) => "\\u" + ch.charCodeAt(0).toString(16).padStart(4, "0"))
);
