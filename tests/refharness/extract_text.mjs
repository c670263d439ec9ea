// Reference-parity harness: run the ACTUAL reference (read-only at
// /root/reference) on a fixture and print its extracted text, exactly
// as its CLI extract verb does (cli/extract.js txt path).
import scribe from '/root/reference/scribe.js';
const inputFile = process.argv[2];
scribe.ScribeDoc.defaults.reflow = true;
scribe.ScribeDoc.defaults.usePDFText.ocr.main = true;
scribe.ScribeDoc.defaults.displayMode = 'ebook';
scribe.opt.inProcess = true;
const doc = await scribe.openDocument([inputFile]);
const txt = await doc.exportData('text');
process.stdout.write(txt);
process.exit(0);
