// Differential-fuzz harness: parse a batch of strings with the REFERENCE
// parser (in-process piscina shim, see tools/gen_goldens.mjs) and print
// the node trees as ASCII-escaped JSON.
//
// stdin:  JSON array of {input: string, options: object}
//         or {file: path, options: object} (parseFile path: BOM sniff +
//         encoding decode run in the reference)
// stdout: JSON array of {nodes: [...]} | {error: string}
//
// Usage: node tools/ref_batch_parse.mjs <shimDir> < cases.json
import { join } from "node:path";

const [shimDir] = process.argv.slice(2);
const { HTMLParser } = await import(join(shimDir, "HTMLParser.js"));

let raw = "";
for await (const chunk of process.stdin) raw += chunk;
const cases = JSON.parse(raw);

// Some hostile inputs crash the REFERENCE itself (unhandled rejection
// from its fire-and-forget parseTemplate, e.g. double-close of the node
// WritableStream). Record those as REF-CRASH results instead of dying —
// the comparison layer treats them as expected divergence (our engine
// never aborts; reference parity is undefined there).
let asyncCrash = null;
process.on("uncaughtException", (err) => { asyncCrash = String(err); });
process.on("unhandledRejection", (err) => { asyncCrash = String(err); });

const out = [];
for (const { input, file, options } of cases) {
  const parser = new HTMLParser(options ?? {});
  asyncCrash = null;
  let hangTimer = null;
  try {
    const result = file != null
      ? parser.parseFile(file)
      : parser.parseString(input);
    const nodes = await Promise.race([
      result.toArray(),
      new Promise((_r, rej) => {
        hangTimer = setTimeout(() => rej(new Error("REF-HANG")), 2000);
      }),
    ]);
    // drain the microtask queue so a late fire-and-forget rejection
    // from THIS case lands here, not on the next case's asyncCrash
    await new Promise((r) => setImmediate(r));
    out.push(asyncCrash != null
      ? { error: "REF-CRASH: " + asyncCrash }
      : { nodes });
  } catch (err) {
    const msg = String(err.message ?? err);
    out.push(msg === "REF-HANG" || asyncCrash != null
      ? { error: "REF-CRASH: " + (asyncCrash ?? msg) }
      : { error: msg });
  } finally {
    // never let a won race leave its 2s loser timer keeping the
    // process alive after the last case
    if (hangTimer != null) clearTimeout(hangTimer);
  }
}
process.stdout.write(
  JSON.stringify(out).replace(/[-￿]/g,
    (ch) => "\\u" + ch.charCodeAt(0).toString(16).padStart(4, "0"))
);
