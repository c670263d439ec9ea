// Reference-parity harness: run the ACTUAL reference (read-only at
// /root/reference) on a fixture and print its extracted text, exactly
// as its CLI extract verb does (cli/extract.js txt path).
import scribe from '/root/reference/scribe.js';
import { loadBuiltInFontsRaw } from '/root/reference/js/fontContainerMain.js';
const inputFile = process.argv[2];
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
const needsFonts = /\.(txt|docx)$/i.test(inputFile);
scribe.opt.inProcess = !needsFonts;
if (needsFonts) await scribe.init({ font: true });
const doc = await scribe.openDocument([inputFile]);
const txt = await doc.exportData('text');
process.stdout.write(txt);
process.exit(0);
