// Prints the reference's debug-CSV export (exportDebugCsv.js writeDebugCsv)
// for the given input document. Mirrors extract_text.mjs conventions.
import scribe from '/root/reference/scribe.js';
import { writeDebugCsv } from '/root/reference/js/export/exportDebugCsv.js';
import { promises as fs } from 'node:fs';
import { tmpdir } from 'node:os';
import { join } from 'node:path';
const inputFile = process.argv[2];
console.log = console.error;
scribe.ScribeDoc.defaults.reflow = true;
scribe.ScribeDoc.defaults.usePDFText.ocr.main = true;
const needsFonts = /\.(txt|docx)$/i.test(inputFile);
scribe.opt.inProcess = !needsFonts;
if (needsFonts) await scribe.init({ font: true });
const doc = await scribe.openDocument([inputFile]);
const out = join(tmpdir(), `dbgcsv_${process.pid}.csv`);
writeDebugCsv({ pages: doc.ocr.active, fileName: out });
// writeDebugCsv fires saveAs without awaiting it; poll for the file.
let csv = null;
for (let i = 0; i < 100 && csv === null; i++) {
  try { csv = await fs.readFile(out, 'utf8'); }
  catch { await new Promise((r) => setTimeout(r, 20)); }
}
await fs.unlink(out);
if (process.env.REF_OUT) {
  await fs.writeFile(process.env.REF_OUT, csv);
  process.exit(0);
}
process.stdout.write(csv, () => process.exit(0));
