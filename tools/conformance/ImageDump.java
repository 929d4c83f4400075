import java.awt.image.BufferedImage;
import java.awt.image.Raster;
import java.io.DataOutputStream;
import java.io.File;
import java.io.FileOutputStream;
import javax.imageio.ImageIO;

/**
 * Reference-decode every image file in a directory via javax.imageio
 * and dump RAW raster samples (no color conversion beyond the
 * reader's own model) as: int32 width, height, bands, then samples
 * in row-major band-interleaved order (big-endian int32). Output is
 * <input>.dump next to each input. Used by
 * tests/test_codec_conformance.py as an independent reference
 * implementation for the pure-Python PNG/GIF/JPEG decoders.
 */
public final class ImageDump {
    public static void main(String[] args) throws Exception {
        File dir = new File(args[0]);
        for (File f : dir.listFiles()) {
            String n = f.getName();
            if (n.endsWith(".dump")) continue;
            BufferedImage img = ImageIO.read(f);
            if (img == null) {
                System.out.println("SKIP " + n);
                continue;
            }
            Raster r = img.getRaster();
            int w = r.getWidth(), h = r.getHeight(), b = r.getNumBands();
            try (DataOutputStream out = new DataOutputStream(
                    new java.io.BufferedOutputStream(
                        new FileOutputStream(f.getPath() + ".dump")))) {
                out.writeInt(w); out.writeInt(h); out.writeInt(b);
                int[] px = new int[b];
                for (int y = 0; y < h; y++)
                    for (int x = 0; x < w; x++) {
                        r.getPixel(x, y, px);
                        for (int k = 0; k < b; k++) out.writeInt(px[k]);
                    }
            }
            System.out.println("OK " + n + " " + w + "x" + h + "x" + b);
        }
    }
}
