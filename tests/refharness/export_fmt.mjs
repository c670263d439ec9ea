import scribe from '/root/reference/scribe.js';
import { loadBuiltInFontsRaw } from '/root/reference/js/fontContainerMain.js';
const inputFile = process.argv[2];
const fmt = process.argv[3] || 'text';
// The reference logs diagnostics (e.g. missing-glyph notices) via
// console.log; route them to stderr so stdout stays pure export bytes.
console.log = console.error;
scribe.ScribeDoc.defaults.reflow = true;
scribe.ScribeDoc.defaults.usePDFText.ocr.main = true;
scribe.ScribeDoc.defaults.displayMode = 'ebook';
// Optional import-option overrides, e.g. DOCX_LINE_SPLIT_MODE=sentence
if (process.env.DOCX_LINE_SPLIT_MODE) {
  scribe.ScribeDoc.defaults.docxLineSplitMode = process.env.DOCX_LINE_SPLIT_MODE;
}
// txt/docx imports typeset with the raw font registry, which only
// propagates to the import workers when the scheduler exists — so those
// formats run in worker mode; everything else stays on the main thread.
// The positioned-HTML export (writeHtml.js) measures every word against
// the raw font registry, so it needs fonts loaded regardless of input type.
const needsFonts = /\.(txt|docx)$/i.test(inputFile) || fmt === 'html';
scribe.opt.inProcess = !needsFonts;
if (needsFonts) await scribe.init({ font: true });
const doc = await scribe.openDocument([inputFile]);
const exportOpts = {};
// OCR-only imports have no inputFileNames; the reference's filename
// column would crash on undefined (writeTabular.js:70)
if (fmt === 'xlsx') exportOpts.xlsxFilenameColumn = false;
const out = await doc.exportData(fmt, exportOpts);
// binary exports (xlsx/docx/pdf) travel base64 — a text pipe mangles raw bytes
const payload = typeof out === 'string' ? out : Buffer.from(out).toString('base64');
if (process.env.REF_OUT) {
  // File sink: immune to worker-thread console noise interleaving on
  // stdout (worker console.log bypasses the main-thread patch above).
  const fs = await import('fs');
  fs.writeFileSync(process.env.REF_OUT, payload);
  process.exit(0);
}
// write callback before exit: process.exit drops anything past the 64 KiB
// pipe buffer, truncating large exports mid-flush
process.stdout.write(payload, () => process.exit(0));
